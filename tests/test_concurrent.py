"""Concurrent-writer robustness: two replays of the same stream racing
into one table must converge to the exact oracle state with every batch
applied exactly once — CAS manifest commits + batch-id fences + the MOR
conflict-retry path (merge rebuilds its manifest delta on the racer's
base; fence-only commits and compactions retry the same way)."""

from __future__ import annotations

import threading

import pandas as pd

from etl_pipeline_spark.lake.lineage import LineageLog
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.pipeline import ApplyConfig
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
from etl_pipeline_spark.sources.genlog import (
    GenConfig,
    expected_final_state,
    generate_delivered_events,
    write_changelog,
)
from etl_pipeline_spark.streaming.ingest import replay_files

KEYS = ["conv_id", "turn_idx"]


def test_concurrent_replays_converge_exactly_once(spark, tmp_path):
    cfg = GenConfig(
        n_events=8_000, batch_size=1_000, shuffle_window=200,
        dup_delivery_rate=0.02,
    )
    changelog = str(tmp_path / "clog")
    write_changelog(cfg, changelog)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=8, write_mode="mor",
    )
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def run():
        barrier.wait()
        try:
            replay_files(
                spark, changelog, table,
                cfg=ApplyConfig(auto_compact_max_files=4),
            )
        except Exception as e:  # pragma: no cover - the assertion target
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # exactly-once: each batch has EXACTLY one applied lineage record
    # across both writers; the loser's records are all fenced skips
    recs = LineageLog(table.root).records()
    applied = [r["batch_id"] for r in recs if not r.get("skipped_fenced")]
    assert sorted(applied) == sorted(set(applied))
    assert len(applied) >= 8  # every batch file landed once

    # state equality against the independent oracle
    exp = expected_final_state(generate_delivered_events(cfg))
    got = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(got) == len(exp)
    a = ["∅" if pd.isna(x) else x for x in got["text"]]
    b = ["∅" if pd.isna(x) else x for x in exp["text"]]
    assert a == b


def test_merge_conflict_retry_preserves_both_writers(spark, tmp_path):
    """Direct conflict injection: writer B commits between writer A's
    write job and A's manifest CAS. A's retry must land ON TOP of B's
    snapshot — both batches' data visible, fence at the max batch id."""
    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=4, write_mode="mor",
    )

    def src(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        )

    # A prepares a merge but B sneaks a commit in first, via pre_commit
    # (invoked exactly between A's write job and A's fence/CAS sequence)
    def b_commits():
        t2 = MiniLakeTable(spark, table.root)  # separate handle
        t2.merge(src([("b", 0, "user", "from-b", None, 10, "I")]), batch_id=0)

    res = table.merge(
        src([("a", 0, "user", "from-a", None, 20, "I")]),
        batch_id=1, pre_commit=b_commits,
    )
    assert not res.skipped
    state = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert state == {"a": "from-a", "b": "from-b"}
    from etl_pipeline_spark.lake.minilake import FENCES_PROP

    assert table.snapshot_props()[FENCES_PROP]["default"] == 1


def test_compact_conflict_keeps_racers_deltas(spark, tmp_path):
    """A compaction whose CAS loses to a concurrent merge must keep the
    merge's freshly appended delta when it retries — folding only the
    dirs it actually read."""
    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=2, write_mode="mor",
    )

    def src(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        )

    for i in range(4):
        table.merge(
            src([(f"k{i}", 0, "user", f"v{i}", None, i + 1, "I")]),
            batch_id=i,
        )
    # inject a racing merge between compact's read and its CAS by
    # pre-writing the manifest version compact will try to claim
    base_version = table.current_version()
    racer = MiniLakeTable(spark, table.root)

    orig_write = table._write_manifest
    raced = []

    def write_with_race(manifest):
        if not raced:
            raced.append(True)
            racer.merge(
                src([("late", 0, "user", "late-v", None, 99, "I")]),
                batch_id=10,
            )
        orig_write(manifest)

    table._write_manifest = write_with_race
    try:
        table.compact(drop_tombstones=False)
    finally:
        table._write_manifest = orig_write
    assert raced
    assert table.current_version() > base_version + 1
    state = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert state == {
        "k0": "v0", "k1": "v1", "k2": "v2", "k3": "v3", "late": "late-v",
    }


def test_two_stream_fan_in_lww_across_streams(spark, tmp_path):
    """Two independent changelog streams (disjoint, monotone lsn
    segments over a SHARED conversation key space — e.g. two binlog
    shards or a re-sharded feed) replay into ONE table under separate
    fence streams; the final state must equal the LWW oracle over the
    UNION of both streams, whatever the replay order."""
    cfg_a = GenConfig(n_events=3_000, batch_size=1_000, seed=1)
    cfg_b = GenConfig(n_events=3_000, batch_size=1_000, seed=2,
                      lsn_offset=3_000)
    clog_a = str(tmp_path / "a")
    clog_b = str(tmp_path / "b")
    write_changelog(cfg_a, clog_a)
    write_changelog(cfg_b, clog_b)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=8, write_mode="mor",
    )
    # interleave: half of A, all of B, rest of A — order must not matter
    replay_files(spark, clog_a, table, stop_after=2)
    replay_files(spark, clog_b, table)
    replay_files(spark, clog_a, table)  # resumes via stream-A fence

    ev = pd.concat(
        [generate_delivered_events(cfg_a), generate_delivered_events(cfg_b)],
        ignore_index=True,
    )
    exp = expected_final_state(ev)
    got = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(got) == len(exp)
    a = ["∅" if pd.isna(x) else x for x in got["text"]]
    b = ["∅" if pd.isna(x) else x for x in exp["text"]]
    assert a == b
    # the two fence streams advanced independently
    from etl_pipeline_spark.lake.minilake import FENCES_PROP

    fences = table.snapshot_props()[FENCES_PROP]
    assert len(fences) == 2 and all(v == 2 for v in fences.values())


def test_racing_compactions_never_double_rows(spark, tmp_path):
    """Deterministic replay of the two-compactions race: a racer runs a
    FULL compaction between this compaction's file write and its
    manifest CAS. The loser's conflict retry must recognize that its
    fold's inputs were already folded away and DISCARD its output —
    registering it next to the racer's would store every key twice, and
    a maintained-snapshot read (fold-skip) would serve the duplicates
    (this is exactly how the concurrent MV refresh test flaked: view
    counts doubled)."""
    import datetime

    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=4, write_mode="mor",
    )
    rows = [
        (f"c{i}", 0, "user", f"t-{i}", datetime.datetime(2024, 1, 1),
         i + 1, "I")
        for i in range(40)
    ]
    table.merge(
        spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=0,
    )
    racer = MiniLakeTable(spark, table.root)
    orig = table._write_manifest
    fired = {"n": 0}

    def hooked(m):
        if fired["n"] == 0:
            fired["n"] = 1
            racer.compact(drop_tombstones=True)  # racer wins the CAS
        return orig(m)

    table._write_manifest = hooked
    try:
        table.compact(drop_tombstones=True)
    finally:
        table._write_manifest = orig

    got = table.read()
    dups = (
        got.groupBy(*KEYS).count().filter("count > 1").count()
    )
    assert dups == 0
    assert got.count() == 40
    # every bucket holds exactly ONE rewrite output (the racer's)
    m = table.manifest()
    assert all(len(ds) == 1 for ds in m["buckets"].values()), m["buckets"]
