"""Merge-on-read mode: delta appends, read-side LWW, mid-stream
compaction, and full replay equality (the same golden gate as COW)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

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


def _mor_table(spark, tmp_path, n_buckets=8):
    return MiniLakeTable.create(
        spark, str(tmp_path / "mor"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=n_buckets, write_mode="mor",
    )


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def test_mor_upsert_delete_stale(spark, tmp_path):
    t = _mor_table(spark, tmp_path)
    t.merge(_src(spark, [("a", 0, "user", "v1", None, 1, "I"),
                         ("b", 0, "user", "x", None, 2, "I")]), batch_id=0)
    t.merge(_src(spark, [("a", 0, "user", "v2", None, 3, "U")]), batch_id=1)
    t.merge(_src(spark, [("b", 0, None, None, None, 10, "D")]), batch_id=2)
    t.merge(_src(spark, [("b", 0, "user", "zombie", None, 5, "U")]), batch_id=3)
    state = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert state == {("a", 0): "v2"}
    # deltas accumulate: no rewrite of prior files
    m = t.manifest()
    assert any(len(v) >= 2 for v in m["buckets"].values())


def test_mor_empty_batch_commits_fence_only(spark, tmp_path):
    """A MOR batch whose write lands zero bucket dirs (empty source) must
    advance the fence via a data-free commit — not hang on an Observation
    whose CollectMetrics node AQE may have eliminated, and not leak the
    empty commit directory."""
    import os

    t = _mor_table(spark, tmp_path)
    t.merge(_src(spark, [("a", 0, "user", "v1", None, 1, "I")]), batch_id=0)
    v1 = t.current_version()
    res = t.merge(_src(spark, []), batch_id=1)
    assert not res.skipped and res.buckets_touched == 0
    assert t.current_version() == v1 + 1
    # fence advanced: a replay of batch 1 is now a no-op
    assert t.merge(_src(spark, []), batch_id=1).skipped
    # the aborted commit dir was cleaned up
    dirs = [d for d in os.listdir(t.data_dir)
            if d.startswith(f"commit-{v1 + 1:06d}")]
    assert dirs == []
    # data unchanged
    assert {r["text"] for r in t.read().collect()} == {"v1"}


def test_mor_empty_batch_pipelined_waits_for_predecessor(spark, tmp_path):
    """In pipelined replay, a MOR empty batch's fence-only commit must
    honor pre_commit ordering and re-read the CAS base: otherwise an
    empty batch k advances the fence past an in-flight k-1 (crash in
    that window = k-1's data skipped forever) and its stale base
    clobbers k-1's just-committed buckets from the manifest."""
    from etl_pipeline_spark.lake.minilake import FENCES_PROP

    t = _mor_table(spark, tmp_path)
    called = []

    def hook():  # simulates waiting for batch 0 to commit mid-wait
        called.append(True)
        t.merge(
            _src(spark, [("a", 0, "user", "pred", None, 1, "I")]), batch_id=0
        )

    res = t.merge(_src(spark, []), batch_id=1, pre_commit=hook)
    assert called, "fence-only path must invoke pre_commit"
    assert not res.skipped and res.buckets_touched == 0
    # fence advanced ON TOP of the predecessor's commit; its data intact
    assert t.snapshot_props()[FENCES_PROP]["default"] == 1
    assert {r["text"] for r in t.read().collect()} == {"pred"}


def test_mor_empty_batch_pipelined_fenced_skip(spark, tmp_path):
    """If a concurrent replay lands the same batch while the empty
    batch waited for its commit turn, the re-read fence must turn the
    fence-only commit into a fenced skip (no duplicate snapshot)."""
    t = _mor_table(spark, tmp_path)

    def hook():
        t.merge(
            _src(spark, [("a", 0, "user", "conc", None, 1, "I")]), batch_id=0
        )
        t.merge(_src(spark, []), batch_id=1)  # concurrent replay wins

    v_hook_end = []

    def hook_wrap():
        hook()
        v_hook_end.append(t.current_version())

    res = t.merge(_src(spark, []), batch_id=1, pre_commit=hook_wrap)
    assert res.skipped and res.reason == "fenced"
    assert t.current_version() == v_hook_end[0]  # no extra snapshot


def test_mor_merge_is_o_batch_not_o_table(spark, tmp_path):
    """A MOR merge must not read existing data files (cost O(batch))."""
    t = _mor_table(spark, tmp_path)
    rows = [(f"c{i}", 0, "user", f"t{i}", None, i + 1, "I") for i in range(100)]
    t.merge(_src(spark, rows), batch_id=0)
    m0 = t.manifest()
    t.merge(_src(spark, [("c7", 0, "user", "up", None, 1000, "U")]), batch_id=1)
    m1 = t.manifest()
    # every pre-existing file path is still listed, untouched
    old_files = {f for v in m0["buckets"].values() for f in v}
    new_files = {f for v in m1["buckets"].values() for f in v}
    assert old_files <= new_files
    assert len(new_files) == len(old_files) + 1  # exactly one delta added


def test_mor_compaction_folds_deltas(spark, tmp_path):
    t = _mor_table(spark, tmp_path, n_buckets=2)
    for i in range(6):
        t.merge(
            _src(spark, [("a", 0, "user", f"v{i}", None, i + 1, "U")]),
            batch_id=i,
        )
    before = t.read().collect()
    assert t.maybe_compact(max_files_per_bucket=3) is not None
    m = t.manifest()
    assert all(len(v) == 1 for v in m["buckets"].values() if v)
    after = t.read().collect()
    assert [r.asDict() for r in before] == [r.asDict() for r in after]
    # threshold not exceeded → no-op
    assert t.maybe_compact(max_files_per_bucket=3) is None


def test_mor_partial_compaction_rewrites_only_hot_buckets(spark, tmp_path):
    """maybe_compact folds only buckets past the threshold: cold buckets'
    files survive byte-identical (O(hot) maintenance, not O(table))."""
    t = _mor_table(spark, tmp_path, n_buckets=8)
    seed = [(f"k{i}", 0, "user", f"v{i}", None, i + 1, "I") for i in range(40)]
    t.merge(_src(spark, seed), batch_id=0)
    for i in range(6):  # hammer one key -> one hot bucket
        t.merge(
            _src(spark, [("k3", 0, "user", f"hot{i}", None, 100 + i, "U")]),
            batch_id=i + 1,
        )
    before_state = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }
    m0 = t.manifest()
    hot = [b for b, v in m0["buckets"].items() if len(v) > 3]
    cold_files = {
        b: tuple(v) for b, v in m0["buckets"].items() if len(v) <= 3
    }
    assert hot and cold_files
    assert t.maybe_compact(max_files_per_bucket=3) is not None
    m1 = t.manifest()
    for b in hot:  # hot buckets folded to one dir
        assert len(m1["buckets"][b]) == 1
    for b, v in cold_files.items():  # cold buckets untouched
        assert tuple(m1["buckets"][b]) == v
    after_state = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }
    assert after_state == before_state
    assert after_state[("k3", 0)] == "hot5"


def test_mor_golden_replay_with_auto_compaction(spark, tmp_path):
    cfg = GenConfig(
        n_events=20_000, batch_size=1_000, shuffle_window=500,
        dup_delivery_rate=0.02, dead_letter_rate=0.01, evolution_batch=5,
    )
    changelog = str(tmp_path / "changelog")
    write_changelog(cfg, changelog)
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA_V0, key_cols=KEYS,
        n_buckets=8, write_mode="mor",
    )
    replay_files(
        spark, changelog, table,
        cfg=ApplyConfig(auto_compact_max_files=4),
    )
    # compaction actually fired mid-stream
    recs = LineageLog(table.root).records()
    assert any(r.get("compacted_to_version") for r in recs)

    exp = expected_final_state(generate_delivered_events(cfg))
    eng = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(eng) == len(exp)
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        a = ["∅" if pd.isna(x) else x for x in eng[col]]
        b = ["∅" if pd.isna(x) else x for x in exp[col]]
        assert a == b, f"{col} mismatch"


def test_mor_crash_resume(spark, tmp_path):
    cfg = GenConfig(n_events=8_000, batch_size=1_000)
    changelog = str(tmp_path / "changelog")
    write_changelog(cfg, changelog)
    table = _mor_table(spark, tmp_path)
    replay_files(spark, changelog, table, stop_after=3)
    replay_files(spark, changelog, table)  # resume from scratch; fence skips 0-2
    exp = expected_final_state(generate_delivered_events(cfg))
    eng = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(eng) == len(exp)
    a = ["∅" if pd.isna(x) else x for x in eng["text"]]
    b = ["∅" if pd.isna(x) else x for x in exp["text"]]
    assert a == b
