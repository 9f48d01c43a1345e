"""Snapshot tag refs: named pins that retention GC honors.

Iceberg tag semantics (refs keep their snapshots through
``expire_snapshots``) on the MiniLake backend: ``create_tag`` /
``read(tag=...)`` / ``delete_tag``, with the tagged version surviving a
GC that drops every other old snapshot — the compliance pin the
reference's keep-nothing full-refresh load
(/root/reference/utils/load.py:26-61) has no way to express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _grown(spark, tmp_path, n=6):
    """A table with n+1 versions: v1 empty, v2..=one merge each."""
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=4, write_mode="mor",
    )
    for i in range(n):
        t.merge(
            _src(spark, [("a", 0, "user", f"v{i}", None, i + 1, "U" if i else "I")]),
            batch_id=i,
        )
    return t


def test_tag_read_and_delete(spark, tmp_path):
    t = _grown(spark, tmp_path)
    v = t.create_tag("audited", version=3)  # after batch 1 (v2=batch 0)
    assert v == 3 and t.tags() == {"audited": 3}
    assert t.read(tag="audited").collect()[0]["text"] == "v1"
    assert t.read().collect()[0]["text"] == "v5"  # head unaffected
    with pytest.raises(ValueError, match="at most one"):
        t.read(tag="audited", version=3)
    t.delete_tag("audited")
    assert t.tags() == {}
    with pytest.raises(KeyError):
        t.read(tag="audited")
    with pytest.raises(KeyError):
        t.delete_tag("audited")


def test_tag_validation(spark, tmp_path):
    t = _grown(spark, tmp_path, n=2)
    with pytest.raises(ValueError, match="no such committed snapshot"):
        t.create_tag("ghost", version=99)
    t.create_tag("pin")  # defaults to current
    assert t.tags()["pin"] == t.current_version()
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("pin", version=1)
    with pytest.raises(ValueError, match="invalid tag name"):
        t.create_tag("../escape")


def test_gc_keeps_tagged_snapshot(spark, tmp_path):
    t = _grown(spark, tmp_path, n=6)
    t.create_tag("audited", version=3)
    stats = t.expire_snapshots(keep_last=2, orphan_min_age_s=0.0)
    assert stats["manifests_removed"] > 0
    # the tagged snapshot still reads exactly, though older and newer
    # non-kept versions are gone
    assert t.read(tag="audited").collect()[0]["text"] == "v1"
    with pytest.raises(ValueError, match="expired by retention"):
        t.read(version=2)
    # dropping the tag releases the pin: the next GC reclaims it
    t.delete_tag("audited")
    t.expire_snapshots(keep_last=2, orphan_min_age_s=0.0)
    with pytest.raises(ValueError, match="expired by retention"):
        t.read(version=3)
    # head unaffected throughout
    assert t.read().collect()[0]["text"] == "v5"


def test_tag_pins_read_not_cdc_chain(spark, tmp_path):
    t = _grown(spark, tmp_path, n=6)
    t.create_tag("old", version=2)
    t.expire_snapshots(keep_last=2, orphan_min_age_s=0.0)
    # snapshot read works; the incremental chain through dropped
    # intermediates fails with the documented clear horizon error
    assert t.read(tag="old").count() == 1
    with pytest.raises(ValueError, match="expired by retention"):
        t.read_changes_since(2).count()


def test_tag_addressed_incremental_read(spark, tmp_path):
    """read_changes_since accepts a TAG as either bound — the 'changes
    since the audited release' idiom. The tag pins its own snapshot;
    the chain through dropped intermediates still fails with the clear
    horizon error (documented: size retention to the consumer's lag)."""
    t = _grown(spark, tmp_path, n=6)
    t.create_tag("rel-1", version=4)  # after the 3rd merge
    by_tag = {r["text"] for r in t.read_changes_since("rel-1").collect()}
    by_ver = {r["text"] for r in t.read_changes_since(4).collect()}
    assert by_tag == by_ver == {"v3", "v4", "v5"}
    # both bounds as tags
    t.create_tag("rel-2", version=6)
    assert {
        r["text"] for r in t.read_changes_since("rel-1", "rel-2").collect()
    } == {"v3", "v4"}
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    # the tag still resolves (its snapshot is pinned), and the chain
    # error is the documented clear one, not a raw FileNotFoundError
    with pytest.raises(ValueError, match="expired by retention"):
        t.read_changes_since("rel-1").count()


def test_expire_older_than_ts_keeps_recent(spark, tmp_path):
    """Iceberg's expire_snapshots(older_than=ts, retain_last=N): every
    snapshot committed at or after the timestamp survives, whatever
    keep_last says; older untagged ones go."""
    t = _grown(spark, tmp_path, n=6)  # versions 1..7
    ts = t.manifest(5)["committed_at"]
    rep = t.expire_snapshots(
        keep_last=1, orphan_min_age_s=0.0, older_than_ts=ts
    )
    assert rep["manifests_removed"] == 4  # v1..v4
    for v in (5, 6, 7):
        t.manifest(v)  # still readable
    with pytest.raises(ValueError, match="expired by retention"):
        t.read(version=4)
    assert t.read().collect()[0]["text"] == "v5"
