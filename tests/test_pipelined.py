"""Pipelined (ordered-commit, overlapped-execution) replay must be
byte-identical to serial replay: same final state, same fences, same
crash-resume behavior, evolution drains correctly, COW falls back."""

from __future__ import annotations

import pandas as pd

from etl_pipeline_spark.lake.minilake import FENCES_PROP, MiniLakeTable
from etl_pipeline_spark.pipeline import ApplyConfig
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA, TRANSCRIPT_SCHEMA_V0
from etl_pipeline_spark.sources.genlog import (
    GenConfig,
    expected_final_state,
    generate_delivered_events,
    write_changelog,
)
from etl_pipeline_spark.streaming.ingest import replay_files

KEYS = ["conv_id", "turn_idx"]

CFG = GenConfig(
    n_events=12_000,
    batch_size=2_000,
    hot_key_fraction=0.3,
    shuffle_window=400,
    dup_delivery_rate=0.02,
    dead_letter_rate=0.01,
)


def _mor_table(spark, root, schema=TRANSCRIPT_SCHEMA):
    return MiniLakeTable.create(
        spark, str(root), schema, key_cols=KEYS, n_buckets=8, write_mode="mor"
    )


def _state(table) -> pd.DataFrame:
    pdf = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    return pdf[["conv_id", "turn_idx", "role", "text"]].astype(object).where(
        pdf[["conv_id", "turn_idx", "role", "text"]].notna(), None
    )


def test_pipelined_equals_serial(spark, tmp_path):
    changelog = str(tmp_path / "clog")
    write_changelog(CFG, changelog)
    serial = _mor_table(spark, tmp_path / "serial")
    replay_files(spark, changelog, serial)
    piped = _mor_table(spark, tmp_path / "piped")
    n = replay_files(spark, changelog, piped, pipeline_depth=3)
    assert n == 7  # 12k events + 2% dup redeliveries → 7 files of 2k
    assert _state(piped).equals(_state(serial))
    # commits landed in batch order → fence is the last batch id
    assert list(piped.snapshot_props()[FENCES_PROP].values()) == [6]


def test_pipelined_crash_resume_exactly_once(spark, tmp_path):
    changelog = str(tmp_path / "clog")
    write_changelog(CFG, changelog)
    table = _mor_table(spark, tmp_path / "t")
    replay_files(spark, changelog, table, pipeline_depth=2, stop_after=3)
    v_crash = table.current_version()
    # resume from scratch: fenced batches must be skipped, rest applied
    replay_files(spark, changelog, table, pipeline_depth=2)
    assert table.current_version() > v_crash
    exp = expected_final_state(generate_delivered_events(CFG))
    got = _state(table)
    assert len(got) == len(exp)
    assert list(got["text"]) == [
        None if pd.isna(t) else t for t in exp["text"]
    ]


def test_pipelined_evolution_drains(spark, tmp_path):
    cfg = GenConfig(
        n_events=10_000, batch_size=2_000, evolution_batch=3,
        dup_delivery_rate=0.01,
    )
    changelog = str(tmp_path / "clog")
    write_changelog(cfg, changelog)
    table = _mor_table(spark, tmp_path / "t", schema=TRANSCRIPT_SCHEMA_V0)
    replay_files(spark, changelog, table, pipeline_depth=3)
    assert "tool" in {f.name for f in table.schema().fields}
    exp = expected_final_state(generate_delivered_events(cfg))
    got = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(got) == len(exp)
    got_tool = [None if pd.isna(t) else t for t in got["tool"]]
    exp_tool = [None if pd.isna(t) else t for t in exp["tool"]]
    assert got_tool == exp_tool


def test_cow_falls_back_to_serial(spark, tmp_path):
    changelog = str(tmp_path / "clog")
    write_changelog(CFG, changelog)
    cow = MiniLakeTable.create(
        spark, str(tmp_path / "cow"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=8, write_mode="cow",
    )
    replay_files(spark, changelog, cow, pipeline_depth=4)  # silently serial
    exp = expected_final_state(generate_delivered_events(CFG))
    assert len(_state(cow)) == len(exp)


def test_failed_batch_blocks_successor_commits(spark, tmp_path):
    """If batch k's job dies, batch k+1 must NOT commit — a fence
    high-water of k+1 with k unapplied would make resume skip k's
    events forever."""
    import pytest

    from etl_pipeline_spark.streaming.ingest import _replay_pipelined
    from etl_pipeline_spark.lake.lineage import LineageLog
    from pyspark.sql import functions as F

    changelog = str(tmp_path / "clog")
    write_changelog(CFG, changelog)
    table = _mor_table(spark, tmp_path / "t")
    from etl_pipeline_spark.sources.changelog import list_batch_files

    files = list_batch_files(changelog)

    def read_fn(group):
        df = spark.read.parquet(*group)
        if group[0] == files[1]:  # batch 1 fails AT EXECUTION time
            # ANSI mode: division by zero throws inside the write job
            df = df.withColumn("lsn", F.col("lsn") / F.lit(0))
        return df

    todo = [(i, [f]) for i, f in enumerate(files[:4])]
    with pytest.raises(Exception):
        _replay_pipelined(
            table, todo, read_fn, ApplyConfig(lineage_level="batch"),
            LineageLog(table.root), "failtest", depth=3,
        )
    fences = table.snapshot_props().get(FENCES_PROP, {}).get("failtest", -1)
    assert fences == 0  # batch 0 committed; 1 failed; 2/3 never committed


def test_pipelined_periodic_compaction_bounds_delta_chains(spark, tmp_path):
    """Long pipelined replays must fold delta chains MID-STREAM (a
    maintenance drain every auto_compact_max_files batches), not let
    them grow with the batch count — and the fold must not perturb the
    final state vs serial replay."""
    changelog = str(tmp_path / "clog")
    write_changelog(CFG, changelog)  # 7 batch files
    serial = _mor_table(spark, tmp_path / "serial")
    replay_files(spark, changelog, serial)

    piped = _mor_table(spark, tmp_path / "piped")
    replay_files(
        spark, changelog, piped, pipeline_depth=3,
        cfg=ApplyConfig(auto_compact_max_files=3),  # drain+fold every 3
    )
    assert _state(piped).equals(_state(serial))
    # compaction commits interleaved with merges → more versions than
    # the 7 merge commits + create
    n_versions = piped.current_version()
    assert n_versions > 8
    # the final manifest's delta chains are bounded by the fold cadence,
    # NOT by the total batch count
    chains = [len(v) for v in piped.manifest()["buckets"].values()]
    assert max(chains) <= 4  # ≤ cadence + in-flight batches since fold
