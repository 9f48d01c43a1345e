"""Write-audit-publish (WAP) staged commits.

Iceberg's ``spark.wap.id`` + ``cherry_pick_snapshot`` pattern on the
MiniLake backend: ``merge(stage_to=...)`` runs the write job but parks
the manifest delta in a staged descriptor; ``read_staged`` is the audit
view; ``publish_staged`` is a metadata-only, fence-rechecked CAS;
``abort_staged`` discards. The pattern the reference's all-or-nothing
truncate+insert load (/root/reference/utils/load.py:213-271) grows into
when a quality gate must inspect a batch BEFORE readers can see it.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import (
    CommitConflict,
    FENCES_PROP,
    MiniLakeTable,
)
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _table(spark, tmp_path, n_buckets=8, write_mode="mor", name="t"):
    return MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=n_buckets,
        write_mode=write_mode,
    )


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _state(t, **read_kwargs):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(**read_kwargs).collect()
    }


def _seeded(spark, tmp_path, **kwargs):
    t = _table(spark, tmp_path, **kwargs)
    t.merge(
        _src(spark, [("a", 0, "user", "hello", None, 1, "I"),
                     ("a", 1, "assistant", "hi", None, 2, "I"),
                     ("b", 0, "user", "yo", None, 3, "I")]),
        batch_id=0,
    )
    return t


def test_stage_is_invisible_until_publish(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v = t.current_version()
    res = t.merge(
        _src(spark, [("a", 0, "user", "hello v2", None, 10, "U"),
                     ("b", 0, None, None, None, 11, "D"),
                     ("c", 0, "user", "new", None, 12, "I")]),
        batch_id=1,
        stage_to="gate-1",
    )
    assert res.staged and res.wap_id == "gate-1" and not res.skipped
    assert res.rows_upserted == 2 and res.rows_deleted == 1
    # nothing committed: version, state and fence unchanged
    assert t.current_version() == v
    assert _state(t) == {("a", 0): "hello", ("a", 1): "hi", ("b", 0): "yo"}
    assert t.snapshot_props()[FENCES_PROP]["default"] == 0
    assert t.list_staged() == ["gate-1"]

    # the audit view shows the pending state without committing it
    assert _state(t, _dirs=None) == _state(t)
    audited = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read_staged("gate-1").collect()
    }
    assert audited == {
        ("a", 0): "hello v2", ("a", 1): "hi", ("c", 0): "new",
    }
    assert t.current_version() == v  # audit committed nothing

    pub = t.publish_staged("gate-1")
    assert not pub.skipped and pub.version == v + 1 and pub.wap_id == "gate-1"
    assert _state(t) == audited
    assert t.snapshot_props()[FENCES_PROP]["default"] == 1
    assert t.list_staged() == []
    with pytest.raises(KeyError):
        t.publish_staged("gate-1")  # descriptor gone after publish


def test_abort_discards_data_and_descriptor(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("a", 0, "user", "BAD", None, 10, "U")]),
        batch_id=1,
        stage_to="gate-bad",
    )
    desc = t._load_staged("gate-bad")
    tops = {os.path.dirname(d) for d in desc["delta_dirs"].values()}
    assert tops and all(os.path.exists(p) for p in tops)
    t.abort_staged("gate-bad")
    assert t.list_staged() == []
    assert not any(os.path.exists(p) for p in tops)
    assert _state(t)[("a", 0)] == "hello"
    # the fence never advanced: the batch re-applies normally
    res = t.merge(
        _src(spark, [("a", 0, "user", "GOOD", None, 10, "U")]), batch_id=1
    )
    assert not res.skipped
    assert _state(t)[("a", 0)] == "GOOD"


def test_publish_is_fenced_when_batch_applied_meanwhile(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("a", 0, "user", "staged copy", None, 10, "U")]),
        batch_id=1,
        stage_to="gate-race",
    )
    # another writer applies the SAME batch id while the audit runs
    t.merge(
        _src(spark, [("a", 0, "user", "winner", None, 10, "U")]), batch_id=1
    )
    desc = t._load_staged("gate-race")
    tops = {os.path.dirname(d) for d in desc["delta_dirs"].values()}
    pub = t.publish_staged("gate-race")
    assert pub.skipped and pub.reason == "fenced"
    assert _state(t)[("a", 0)] == "winner"
    # the fenced publish cleaned its staged files up
    assert t.list_staged() == []
    assert not any(os.path.exists(p) for p in tops)


def test_publish_rebases_over_concurrent_commits(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("a", 0, "user", "staged", None, 10, "U")]),
        batch_id=1,
        stage_to="gate-rebase",
        stream_id="wap",
    )
    # an unrelated stream commits twice between stage and publish
    t.merge(_src(spark, [("d", 0, "user", "other1", None, 20, "I")]),
            batch_id=0, stream_id="other")
    t.merge(_src(spark, [("d", 1, "user", "other2", None, 21, "I")]),
            batch_id=1, stream_id="other")
    pub = t.publish_staged("gate-rebase")
    assert not pub.skipped
    s = _state(t)
    assert s[("a", 0)] == "staged"
    assert s[("d", 0)] == "other1" and s[("d", 1)] == "other2"
    fences = t.snapshot_props()[FENCES_PROP]
    assert fences["wap"] == 1 and fences["other"] == 1


def test_empty_staged_batch_publishes_fence_only(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v = t.current_version()
    empty = _src(spark, []).limit(0)
    res = t.merge(empty, batch_id=1, stage_to="gate-empty")
    assert res.staged and res.buckets_touched == 0
    assert t.current_version() == v
    pub = t.publish_staged("gate-empty")
    assert not pub.skipped and pub.rows_upserted == 0
    assert t.snapshot_props()[FENCES_PROP]["default"] == 1
    assert _state(t) == {("a", 0): "hello", ("a", 1): "hi", ("b", 0): "yo"}


def test_retention_gc_never_reaps_staged_dirs(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    for i in range(4):  # age the snapshot chain past keep_last
        t.merge(
            _src(spark, [("b", 0, "user", f"v{i}", None, 20 + i, "U")]),
            batch_id=1 + i,
        )
    t.merge(
        _src(spark, [("a", 0, "user", "staged", None, 90, "U")]),
        batch_id=99,
        stage_to="gate-gc",
    )
    t.expire_snapshots(keep_last=2, orphan_min_age_s=0.0)
    # staged dirs survived the zero-age orphan sweep; publish still works
    pub = t.publish_staged("gate-gc")
    assert not pub.skipped
    assert _state(t)[("a", 0)] == "staged"


def test_stage_requires_mor_and_no_pre_commit(spark, tmp_path):
    cow = _table(spark, tmp_path, write_mode="cow", name="cow")
    with pytest.raises(ValueError, match="merge-on-read"):
        cow.merge(
            _src(spark, [("a", 0, "user", "x", None, 1, "I")]),
            batch_id=0,
            stage_to="gate",
        )
    mor = _table(spark, tmp_path, name="mor")
    with pytest.raises(ValueError, match="pre_commit"):
        mor.merge(
            _src(spark, [("a", 0, "user", "x", None, 1, "I")]),
            batch_id=0,
            stage_to="gate",
            pre_commit=lambda: None,
        )


def test_duplicate_wap_id_rejected_and_cleaned(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("a", 0, "user", "first", None, 10, "U")]),
        batch_id=1,
        stage_to="gate-dup",
    )
    before = t._load_staged("gate-dup")
    with pytest.raises(ValueError, match="already exists"):
        t.merge(
            _src(spark, [("a", 0, "user", "second", None, 11, "U")]),
            batch_id=2,
            stage_to="gate-dup",
        )
    # the loser's unreferenced delta dirs were dropped, the original kept
    assert t._load_staged("gate-dup") == before
    data_tops = set(os.listdir(t.data_dir))
    kept_tops = {
        os.path.basename(os.path.dirname(d))
        for d in before["delta_dirs"].values()
    }
    m = t.manifest()
    committed_tops = {
        os.path.basename(os.path.dirname(d))
        for ds in m["buckets"].values()
        for d in ds
    }
    assert data_tops == kept_tops | committed_tops


def test_rescale_refuses_with_staged_pending(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("a", 0, "user", "staged", None, 10, "U")]),
        batch_id=1,
        stage_to="gate-rs",
    )
    with pytest.raises(ValueError, match="staged commits pending"):
        t.rescale_buckets(4)
    t.abort_staged("gate-rs")
    assert t.rescale_buckets(4) > 0  # clean rescale once aborted


def test_publish_detects_bucket_layout_change(spark, tmp_path):
    # defense-in-depth for the cross-process race rescale_buckets' local
    # staged check can't see: a descriptor staged under another modulus
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("a", 0, "user", "staged", None, 10, "U")]),
        batch_id=1,
        stage_to="gate-mod",
    )
    p = t._staged_path("gate-mod")
    with open(p) as f:
        desc = json.load(f)
    desc["n_buckets"] = 99
    with open(p, "w") as f:
        json.dump(desc, f)
    with pytest.raises(CommitConflict, match="bucket layout changed"):
        t.publish_staged("gate-mod")
    with pytest.raises(CommitConflict, match="bucket layout changed"):
        t.read_staged("gate-mod")


def test_staged_batch_survives_schema_evolution_at_publish(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.merge(
        _src(spark, [("c", 0, "user", "pre-evolution", None, 10, "I")]),
        batch_id=1,
        stage_to="gate-evo",
    )
    t.add_columns([T.StructField("tool", T.StringType(), True)])
    pub = t.publish_staged("gate-evo")
    assert not pub.skipped
    rows = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["tool"])
        for r in t.read().collect()
    }
    # staged files predate the column: projected as null (Iceberg
    # add-column semantics), exactly like any pre-evolution delta file
    assert rows[("c", 0)] == ("pre-evolution", None)
