"""Structured Streaming ingest: foreachBatch MERGE, checkpointed offsets,
availableNow bounded replay, restart-from-checkpoint picks up new files."""

from __future__ import annotations

import pandas as pd

from etl_pipeline_spark.lake.lineage import LineageLog
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
from etl_pipeline_spark.sources.genlog import (
    GenConfig,
    expected_final_state,
    generate_events,
    write_changelog,
)
from etl_pipeline_spark.streaming.ingest import run_ingest_stream

KEYS = ["conv_id", "turn_idx"]


def _state(table) -> pd.DataFrame:
    pdf = table.read().toPandas()
    return pdf.sort_values(KEYS).reset_index(drop=True)


def _texts(df) -> list:
    return [None if pd.isna(t) else t for t in df["text"]]


def test_streaming_availablenow_end_to_end(spark, tmp_path):
    cfg = GenConfig(n_events=8_000, batch_size=2_000)
    changelog = str(tmp_path / "changelog")
    write_changelog(cfg, changelog)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPT_SCHEMA, key_cols=KEYS, n_buckets=8
    )
    run_ingest_stream(
        spark, changelog, table, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    oracle = expected_final_state(generate_events(cfg))
    eng = _state(table)
    assert len(eng) == len(oracle)
    assert _texts(eng) == _texts(oracle)
    # per-batch lineage was emitted with snapshot ids
    recs = [
        r for r in LineageLog(table.root).records() if not r.get("skipped_fenced")
    ]
    assert len(recs) == 4
    assert all(r.get("commit_snapshot_id") for r in recs)


def test_streaming_restart_processes_only_new_files(spark, tmp_path):
    import os
    import shutil

    cfg = GenConfig(n_events=6_000, batch_size=1_000)
    full = str(tmp_path / "full")
    paths = write_changelog(cfg, full)
    changelog = str(tmp_path / "changelog")
    os.makedirs(changelog)
    for p in paths[:4]:  # only 4 of 6 batch files have "arrived"
        shutil.copy(p, changelog)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPT_SCHEMA, key_cols=KEYS, n_buckets=8
    )
    ckpt = str(tmp_path / "ckpt")
    run_ingest_stream(spark, changelog, table, ckpt, max_files_per_trigger=2)
    v1 = table.current_version()

    # the remaining files arrive; restart from the same checkpoint —
    # already-processed files must not be re-read (offsets) nor
    # re-applied (fence)
    for p in paths[4:]:
        shutil.copy(p, changelog)

    run_ingest_stream(spark, changelog, table, ckpt, max_files_per_trigger=2)
    oracle = expected_final_state(generate_events(cfg))
    eng = _state(table)
    assert len(eng) == len(oracle)
    assert _texts(eng) == _texts(oracle)
    assert table.current_version() > v1


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    """Watermarked tumbling-window aggregation over the change stream
    (SURVEY §2.8 streaming gap-fill): append mode only emits windows the
    watermark has closed; the emitted ones must equal the batch
    computation of the same windows."""
    import pyspark.sql.functions as F

    cfg = GenConfig(n_events=5_000, batch_size=1_000)
    changelog = str(tmp_path / "clog")
    write_changelog(cfg, changelog)

    from etl_pipeline_spark.sources.changelog import read_events_stream

    stream = read_events_stream(spark, changelog, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["w"]["start"], r["op"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got, "watermark should have closed at least one window"

    # batch reference: same windows computed over the full data
    batch = spark.read.parquet(changelog)
    ref = {
        (r["w"]["start"], r["op"]): r["n"]
        for r in batch.groupBy(F.window("ts", "5 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for key, n in got.items():
        assert ref[key] == n, f"window {key}: stream {n} != batch {ref[key]}"


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming-native at-least-once dedup: duplicate deliveries of the
    same lsn within the watermark horizon collapse to one row BEFORE the
    sink (dropDuplicatesWithinWatermark keeps state only for the
    watermark window — O(recent lsns), not O(all lsns ever)."""
    from etl_pipeline_spark.sources.changelog import read_events_stream

    cfg = GenConfig(
        n_events=5_000, batch_size=1_000, dup_delivery_rate=0.05,
        evolution_batch=0,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)

    events = (
        read_events_stream(spark, clog, max_files_per_trigger=2)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["lsn"])
    )
    q = (
        events.writeStream.format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT lsn) AS d FROM dedup_stream"
    ).collect()[0]
    assert got["n"] == got["d"], "duplicate lsns must collapse in-stream"
    assert got["d"] == 5_000


def test_streaming_schema_evolution_in_flight(spark, tmp_path):
    """Streaming twin of test_replay.test_schema_evolution_in_flight:
    the `tool` column is born mid-changelog, the table starts WITHOUT
    it, and ingest goes through run_ingest_stream_evolving — per-run
    footer reconciliation must surface the new column, apply_batch must
    evolve the table in-flight, and the final state must equal the
    oracle including pre-birth rows reading tool as null."""
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0
    from etl_pipeline_spark.sources.genlog import generate_delivered_events
    from etl_pipeline_spark.streaming.ingest import run_ingest_stream_evolving

    cfg = GenConfig(n_events=10_000, batch_size=2_000, evolution_batch=3)
    changelog = str(tmp_path / "changelog")
    write_changelog(cfg, changelog)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=8,
    )
    restarts = run_ingest_stream_evolving(
        spark, changelog, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    # births were visible from the first reconciliation → no restart
    assert restarts == 0
    assert "tool" in [f.name for f in table.schema().fields]
    oracle = expected_final_state(generate_delivered_events(cfg))
    got = _state(table)
    assert len(got) == len(oracle)
    assert _texts(got) == _texts(oracle)
    assert oracle["tool"].isna().any()  # pre-birth rows exist
    got_tool = [None if pd.isna(t) else t for t in got["tool"]]
    ora_tool = [None if pd.isna(t) else t for t in oracle["tool"]]
    assert got_tool == ora_tool


def test_streaming_widen_on_compact_metadata_batch(spark, tmp_path):
    """A column born exactly in a compactInterval-th micro-batch — where
    Spark's CompactibleFileStreamLog writes '<batchId>.compact' instead
    of the plain per-batch metadata file — must still trip the
    in-trigger guard. The guard falls back to the compact log (a
    superset file list; pre-birth files carry no new columns), so the
    birth cannot slip through and be applied with the narrow schema."""
    import os

    from etl_pipeline_spark.schema import CHANGE_EVENT_SCHEMA_V0
    from etl_pipeline_spark.sources.genlog import generate_delivered_events
    from etl_pipeline_spark.streaming.ingest import run_ingest_stream_evolving

    # 11 one-file batches; `tool` is born in batch file 9 — the default
    # spark.sql.streaming.fileSource.log.compactInterval=10 makes batch 9
    # the first compacted metadata entry.
    cfg = GenConfig(n_events=11_000, batch_size=1_000, evolution_batch=9)
    changelog = str(tmp_path / "changelog")
    write_changelog(cfg, changelog)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=8,
    )
    ckpt = str(tmp_path / "ckpt")
    restarts = run_ingest_stream_evolving(
        spark, changelog, table, ckpt,
        max_files_per_trigger=1,
        initial_schema=CHANGE_EVENT_SCHEMA_V0,  # simulate late birth
    )
    assert restarts == 1  # the guard fired AT the compact batch
    # precondition check: batch 9's metadata really was the compact file
    assert os.path.exists(os.path.join(ckpt, "sources", "0", "9.compact"))
    assert not os.path.exists(os.path.join(ckpt, "sources", "0", "9"))
    oracle = expected_final_state(generate_delivered_events(cfg))
    got = _state(table)
    assert len(got) == len(oracle)
    assert _texts(got) == _texts(oracle)
    got_tool = [None if pd.isna(t) else t for t in got["tool"]]
    ora_tool = [None if pd.isna(t) else t for t in oracle["tool"]]
    assert got_tool == ora_tool  # batch-9 tool values were NOT dropped


def test_streaming_restart_on_widen_mid_stream(spark, tmp_path):
    """The in-trigger guard: when a column is born in files the running
    query's schema does NOT include (simulated by pinning the initial
    schema to the pre-birth view), the trigger must fail BEFORE applying
    any row, and the restart must re-deliver that batch from the
    checkpoint with the widened schema — no lost column, no double
    apply."""
    from etl_pipeline_spark.schema import CHANGE_EVENT_SCHEMA_V0
    from etl_pipeline_spark.sources.genlog import generate_delivered_events
    from etl_pipeline_spark.streaming.ingest import run_ingest_stream_evolving

    cfg = GenConfig(n_events=10_000, batch_size=2_000, evolution_batch=3)
    changelog = str(tmp_path / "changelog")
    write_changelog(cfg, changelog)
    table = MiniLakeTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=8,
    )
    restarts = run_ingest_stream_evolving(
        spark, changelog, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        initial_schema=CHANGE_EVENT_SCHEMA_V0,  # simulate late birth
    )
    assert restarts == 1  # exactly one widen-restart at the birth batch
    oracle = expected_final_state(generate_delivered_events(cfg))
    got = _state(table)
    assert len(got) == len(oracle)
    assert _texts(got) == _texts(oracle)
    got_tool = [None if pd.isna(t) else t for t in got["tool"]]
    ora_tool = [None if pd.isna(t) else t for t in oracle["tool"]]
    assert got_tool == ora_tool
    # exactly-once held across the restart: every non-fenced batch
    # applied exactly once
    recs = [r for r in LineageLog(table.root).records()
            if not r.get("skipped_fenced")]
    ids = [r["batch_id"] for r in recs]
    assert len(ids) == len(set(ids))
