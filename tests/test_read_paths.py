"""Point-lookup pruning + incremental change reads on the MiniLake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=8, write_mode="mor",
    )
    t.merge(_batch(spark, [(f"c{i}", 0, f"v{i}", i, "I") for i in range(40)]),
            batch_id=0)
    t.merge(_batch(spark, [("c3", 0, "v3b", 100, "U"), ("c5", 0, None, 101, "D"),
                           ("c40", 0, "new", 102, "I")]), batch_id=1)
    return t


def test_point_lookup_prunes_buckets(table):
    got = {r["conv_id"]: r["text"] for r in table.read_for_keys(["c3", "c7"]).collect()}
    assert got == {"c3": "v3b", "c7": "v7"}
    # deleted key reads as absent
    assert table.read_for_keys(["c5"]).count() == 0
    # pruning: the lookup scans strictly fewer files than a full read
    full = set(table.read().inputFiles())
    pruned = set(table.read_for_keys(["c3"]).inputFiles())
    assert pruned and pruned < full


def test_incremental_changes_are_per_batch_winners(table):
    ch = table.read_changes_since(2)  # after batch 0's commit (v2)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in ch.collect()}
    assert set(rows) == {("c3", 0), ("c5", 0), ("c40", 0)}
    assert rows[("c3", 0)]["_deleted"] is False
    assert rows[("c5", 0)]["_deleted"] is True  # tombstones ARE changes
    # nothing since the head
    assert table.read_changes_since(table.current_version()).count() == 0


def test_timestamp_as_of_time_travel(spark, table):
    """TIMESTAMP AS OF: a read pinned between two commits sees exactly
    the earlier snapshot; before-creation timestamps are an error."""
    t1 = table.manifest(2)["committed_at"]  # after batch 0
    t2 = table.manifest(3)["committed_at"]  # after batch 1
    mid = (t1 + t2) / 2
    got = {r["conv_id"]: r["text"]
           for r in table.read(as_of_ts=mid).collect()}
    assert got["c3"] == "v3" and "c40" not in got  # pre-batch-1 state
    head = {r["conv_id"]: r["text"]
            for r in table.read(as_of_ts=t2 + 1).collect()}
    assert head["c3"] == "v3b" and head["c40"] == "new"
    assert table.version_as_of(mid) == 2
    with pytest.raises(ValueError):
        table.version_as_of(0.0)
    with pytest.raises(ValueError):
        table.read(version=2, as_of_ts=mid)


def test_expire_snapshots_retention(spark, table):
    table.compact(drop_tombstones=False)
    v_head = table.current_version()
    state_before = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in table.read().collect()
    )
    res = table.expire_snapshots(keep_last=1)
    assert res["manifests_removed"] >= 2
    assert res["dirs_removed"] >= 1  # folded delta dirs reclaimed
    # head snapshot intact, state identical
    assert table.current_version() == v_head
    after = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in table.read().collect()
    )
    assert after == state_before
    # time travel past the horizon is gone — the standard retention
    # trade, surfaced as a clear error naming the earliest retained
    with pytest.raises(ValueError, match="retention"):
        table.manifest(2)


def test_incremental_changes_survive_compaction(spark, table):
    # fold everything, then land one more batch: the pre-compaction
    # deltas must still be served (compaction is maintenance, not change)
    table.compact(drop_tombstones=False)
    table.merge(_batch(spark, [("c0", 0, "v0c", 200, "U")]), batch_id=2)
    ch = table.read_changes_since(2)
    keys = {(r["conv_id"], r["turn_idx"]) for r in ch.collect()}
    assert keys == {("c3", 0), ("c5", 0), ("c40", 0), ("c0", 0)}
    # and the compaction snapshot itself contributed no "changes"
    lsns = sorted(r["_lsn"] for r in ch.collect())
    assert lsns == [100, 101, 102, 200]


def test_expire_spares_young_orphans(table):
    """A dir referenced by NO manifest may be a CONCURRENT writer's
    staged-but-not-yet-committed data (writers stage files before their
    CAS commit). expire_snapshots must leave it alone until it is older
    than orphan_min_age_s — Iceberg's remove_orphan_files(older_than=...)
    guard — while still reclaiming expired-snapshot dirs immediately."""
    import os

    table.compact(drop_tombstones=False)
    orphan = os.path.join(table.data_dir, "commit_inflight_fake")
    os.makedirs(os.path.join(orphan, "bucket=0"))
    with open(os.path.join(orphan, "bucket=0", "part-0.parquet"), "wb") as f:
        f.write(b"not-yet-committed")

    res = table.expire_snapshots(keep_last=1)  # default 24h guard
    assert res["young_orphans_skipped"] == 1
    assert os.path.exists(orphan)
    assert res["dirs_removed"] >= 1  # expired dirs still reclaimed now
    before = sorted(
        (r["conv_id"], r["turn_idx"]) for r in table.read().collect()
    )

    # after a known crash the operator passes 0 and the orphan goes away
    res2 = table.expire_snapshots(keep_last=1, orphan_min_age_s=0)
    assert not os.path.exists(orphan)
    assert res2["young_orphans_skipped"] == 0
    after = sorted(
        (r["conv_id"], r["turn_idx"]) for r in table.read().collect()
    )
    assert after == before  # live state never touched
