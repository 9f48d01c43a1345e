"""CSV export sink (reference utils/load.py:26-61 semantics)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_pipeline_spark.sinks import export_csv


def test_export_csv_roundtrip_and_overwrite(spark, tmp_path):
    out = str(tmp_path / "docs.csv")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.concat(F.lit("t,ext-"), F.col("id").cast("string")).alias("s"),
    )
    assert export_csv(df, out) is True
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 100
    assert back.columns == ["id", "v", "s"]
    # quoted comma survives the round trip
    assert back.filter(F.col("s") == "t,ext-7").count() == 1

    # full refresh: second export replaces, never appends
    assert export_csv(df.limit(10), out) is True
    assert spark.read.option("header", "true").csv(out).count() == 10


def test_export_csv_single_file_and_empty_guard(spark, tmp_path):
    out = str(tmp_path / "one.csv")
    df = spark.range(50).repartition(8)
    assert export_csv(df, out, single_file=True) is True
    assert len(glob.glob(f"{out}/part-*.csv")) == 1

    # empty frame: skipped, existing export untouched (load.py:38-40)
    assert export_csv(df.filter(F.col("id") < 0), out) is False
    assert spark.read.option("header", "true").csv(out).count() == 50
