"""LWW reduce: correctness + salted/plain equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.operators.lww import (
    detect_hot_keys,
    lww_reduce,
    lww_reduce_salted,
)
from etl_pipeline_spark.sources.genlog import GenConfig, generate_events


def _events_df(spark, cfg):
    pdf = generate_events(cfg)
    return spark.createDataFrame(pdf)


def test_lww_picks_highest_lsn(spark):
    df = spark.createDataFrame(
        [
            ("a", 0, 1, "v1"),
            ("a", 0, 3, "v3"),
            ("a", 0, 2, "v2"),
            ("b", 1, 10, "only"),
        ],
        "conv_id string, turn_idx int, lsn long, text string",
    )
    out = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["lsn"])
        for r in lww_reduce(df, ["conv_id", "turn_idx"]).collect()
    }
    assert out == {("a", 0): ("v3", 3), ("b", 1): ("only", 10)}


def test_lww_whole_row_wins(spark):
    # the winning row's nulls must win too (no per-column last-non-null)
    df = spark.createDataFrame(
        [("a", 0, 1, "old", "user"), ("a", 0, 2, None, None)],
        "conv_id string, turn_idx int, lsn long, text string, role string",
    )
    row = lww_reduce(df, ["conv_id", "turn_idx"]).collect()[0]
    assert row["text"] is None and row["role"] is None and row["lsn"] == 2


def test_salted_equals_plain(spark):
    df = _events_df(
        spark, GenConfig(n_events=20_000, hot_key_fraction=0.9)
    ).withColumn("op", F.col("op"))
    keys = ["conv_id", "turn_idx"]
    payload = ["op", "role", "text", "tool", "ts"]
    plain = lww_reduce(df, keys, "lsn", payload)
    salted = lww_reduce_salted(df, keys, "lsn", payload, n_salts=8)
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_detect_hot_keys(spark):
    hot = _events_df(spark, GenConfig(n_events=30_000, hot_key_fraction=0.95))
    uniform = _events_df(spark, GenConfig(n_events=30_000))
    assert detect_hot_keys(
        hot, ["conv_id"], threshold_fraction=0.05, sample_fraction=0.5,
        min_sample_rows=1000,
    )
    assert not detect_hot_keys(
        uniform, ["conv_id"], threshold_fraction=0.05, sample_fraction=0.5,
        min_sample_rows=1000,
    )
