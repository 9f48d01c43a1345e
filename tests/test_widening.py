"""Metadata-only type widening (Iceberg ALTER COLUMN ... TYPE analog).

`widen_column_type` grows a payload column's declared type in a new
snapshot with zero file rewrites: Spark's Parquet readers natively
upcast the narrow on-disk values (int32 read as bigint, float as
double — SPARK-40876), later writes land at the wide type, and time
travel to a pre-widen snapshot still reads the narrow type. Unsafe
promotions (lossy, or anything Parquet can't upcast) and key columns
(bucket hashes are type-sensitive) are rejected loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

BIG = 2**40  # far beyond int32


def _metrics_table(spark, tmp_path, name="t", engine="lww", agg_spec=None):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n", T.IntegerType(), True),
            T.StructField("score", T.FloatType(), True),
        ]
    )
    return MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        schema,
        key_cols=["conv_id"],
        n_buckets=4,
        write_mode="mor",
        merge_engine=engine,
        agg_spec=agg_spec,
    )


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, n int, score float, lsn long, op string"
    )


def _src_wide(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, n long, score double, lsn long, op string"
    )


def test_widen_reads_old_files_and_accepts_wide_writes(spark, tmp_path):
    t = _metrics_table(spark, tmp_path)
    t.merge(_src(spark, [("a", 7, 1.5, 1, "I"), ("b", 9, 2.5, 2, "I")]),
            batch_id=0)
    files_before = sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    )
    v_pre = t.current_version()
    t.widen_column_type("n", T.LongType())
    t.widen_column_type("score", T.DoubleType())
    # no data rewrite
    assert sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    ) == files_before
    # old narrow files read back at the wide type
    got = {r["conv_id"]: (r["n"], r["score"]) for r in t.read().collect()}
    assert got == {"a": (7, 1.5), "b": (9, 2.5)}
    types = dict(t.read().dtypes)
    assert types["n"] == "bigint" and types["score"] == "double"
    # post-widen write with a value int32 cannot hold; LWW spans the DDL
    t.merge(_src_wide(spark, [("a", BIG, 9.25, 10, "U")]), batch_id=1)
    got = {r["conv_id"]: r["n"] for r in t.read().collect()}
    assert got == {"a": BIG, "b": 9}
    # time travel reads the pre-widen snapshot at the narrow type
    old = dict(t.read(version=v_pre).dtypes)
    assert old["n"] == "int" and old["score"] == "float"


def test_widen_survives_compaction_and_fresh_handle(spark, tmp_path):
    t = _metrics_table(spark, tmp_path)
    t.merge(_src(spark, [("a", 7, 1.5, 1, "I")]), batch_id=0)
    t.widen_column_type("n", T.LongType())
    t.merge(_src_wide(spark, [("b", BIG, 2.0, 2, "I")]), batch_id=1)
    t.compact()
    t2 = MiniLakeTable(spark, t.root)
    got = {r["conv_id"]: r["n"] for r in t2.read().collect()}
    assert got == {"a": 7, "b": BIG}
    assert dict(t2.read().dtypes)["n"] == "bigint"


def test_widen_composes_with_rename(spark, tmp_path):
    t = _metrics_table(spark, tmp_path)
    t.merge(_src(spark, [("a", 7, 1.5, 1, "I")]), batch_id=0)
    t.rename_column("n", "n_events")
    t.widen_column_type("n_events", T.LongType())
    # the physical-name indirection must survive the widen (files keep
    # the original on-disk column name)
    got = {r["conv_id"]: r["n_events"] for r in t.read().collect()}
    assert got == {"a": 7}
    t.merge(
        spark.createDataFrame(
            [("a", BIG, 3.0, 5, "U")],
            "conv_id string, n_events long, score double, lsn long, op string",
        ),
        batch_id=1,
    )
    assert t.read().collect()[0]["n_events"] == BIG


def test_widen_agg_sum_state_outgrows_int(spark, tmp_path):
    t = _metrics_table(
        spark, tmp_path, engine="agg", agg_spec={"n": "sum", "score": "max"}
    )
    t.merge(_src(spark, [("a", 2**30, 1.0, 1, "I")]), batch_id=0)
    t.merge(_src(spark, [("a", 2**30, 2.0, 2, "I")]), batch_id=1)
    # two int-typed deltas whose SUM no longer fits int32 — the widen
    # makes the fold land at bigint (the canonical agg-engine use)
    t.widen_column_type("n", T.LongType())
    got = t.read().collect()[0]
    assert got["n"] == 2**31 and got["score"] == 2.0


def test_widen_rejections(spark, tmp_path):
    t = _metrics_table(spark, tmp_path)
    with pytest.raises(ValueError, match="key column"):
        t.widen_column_type("conv_id", T.StringType())
    with pytest.raises(ValueError, match="already"):
        t.widen_column_type("n", T.IntegerType())
    with pytest.raises(ValueError, match="unsafe type change"):
        t.widen_column_type("n", T.StringType())
    with pytest.raises(ValueError, match="unsafe type change"):
        t.widen_column_type("score", T.IntegerType())  # narrowing
    with pytest.raises(ValueError, match="no column"):
        t.widen_column_type("ghost", T.LongType())
