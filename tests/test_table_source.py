"""Streaming table read (`minilake_changes` Python data source).

The stream must serve EXACTLY what `read_changes_since` serves for the
same version span — per-batch LWW winners, tombstones included,
maintenance rewrites excluded — with Spark-checkpointed version offsets
giving exactly-once resume, and the evolution contract (defaults,
renames) identical to the batch read path.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0
from etl_pipeline_spark.streaming.table_source import register

KEYS = ["conv_id", "turn_idx"]


def _rows(spark, tag, n, op="U", base_lsn=None):
    base = base_lsn if base_lsn is not None else 1000 * ord(tag[0])
    return spark.createDataFrame(
        [
            (
                f"c{i}", 0, "user", f"{tag}-{i}",
                datetime.datetime(2024, 1, 1, i % 24), base + i, op,
            )
            for i in range(n)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path, name="t"):
    return MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=4,
        write_mode="mor",
    )


def _drain(spark, root, out_dir, ckpt, starting=None):
    """One availableNow pass into a parquet sink (fault-tolerant, so the
    checkpoint carries exactly-once across runs)."""
    register(spark)
    reader = spark.readStream.format("minilake_changes").option("path", root)
    if starting is not None:
        reader = reader.option("startingVersion", starting)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_stream_equals_batch_change_feed(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, "a", 8), batch_id=0)
    t.merge(_rows(spark, "b", 5, op="D"), batch_id=1)
    t.compact(drop_tombstones=False)  # maintenance: must NOT appear
    t.merge(_rows(spark, "d", 3), batch_id=2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    got = spark.read.parquet(out)
    assert _sorted(got.drop("_commit_version")) == _sorted(
        t.read_changes_since(1)
    )
    # provenance: one commit version per merge, none for the compaction
    assert got.select("_commit_version").distinct().count() == 3


def test_checkpoint_resume_serves_only_new_changes(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, "a", 6), batch_id=0)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    v_mid = t.current_version()
    assert spark.read.parquet(out).count() == 6
    t.merge(_rows(spark, "b", 4), batch_id=1)
    t.merge(_rows(spark, "e", 2, op="D"), batch_id=2)
    _drain(spark, t.root, out, ckpt)  # same checkpoint: resume, not replay
    got = spark.read.parquet(out)
    assert got.count() == 12  # 6 + 4 + 2, nothing twice
    new = got.filter(F.col("text").startswith("b") | F.col("_deleted"))
    assert _sorted(new.drop("_commit_version")) == _sorted(
        t.read_changes_since(v_mid)
    )


def test_starting_version_current_tails_only(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, "a", 9), batch_id=0)
    frozen = t.current_version()
    t.merge(_rows(spark, "b", 2), batch_id=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt, starting=str(frozen))
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r["text"] for r in got.collect()} == {"b-0", "b-1"}


def test_evolution_defaults_and_rename_match_batch_path(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, "a", 5), batch_id=0)
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        defaults={"tool": "none"},
    )
    t.rename_column("role", "speaker")
    src = _rows(spark, "b", 3).withColumn("tool", F.lit("search"))
    t.merge(
        src.withColumnRenamed("role", "speaker"), batch_id=1
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    got = spark.read.parquet(out)
    # pre-add dir surfaces the initial-default, post-add the stored value
    tools = {r["text"]: r["tool"] for r in got.collect()}
    assert tools["a-0"] == "none" and tools["b-0"] == "search"
    assert "speaker" in got.columns and "role" not in got.columns
    assert _sorted(got.drop("_commit_version")) == _sorted(
        t.read_changes_since(1)
    )


def test_non_lww_engines_are_rejected(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("score", T.LongType()),
        ]
    )
    t = MiniLakeTable.create(
        spark, str(tmp_path / "agg"), schema,
        key_cols=KEYS, n_buckets=2, write_mode="mor",
        merge_engine="agg", agg_spec={"score": "sum"},
    )
    register(spark)
    with pytest.raises(Exception, match="LWW tables only"):
        (
            spark.readStream.format("minilake_changes")
            .option("path", t.root)
            .load()
        )


def test_expired_horizon_fails_with_reseed_error(spark, tmp_path):
    t = _table(spark, tmp_path)
    for i in range(4):
        t.merge(_rows(spark, chr(97 + i), 2, base_lsn=100 * i), batch_id=i)
    t.expire_snapshots(keep_last=2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="retention GC|re-seed"):
        _drain(spark, t.root, out, ckpt, starting="1")


def test_additive_evolution_restart_adopts_schema_rows_exactly_once(
    spark, tmp_path
):
    """The restart-on-widen contract (module docstring): the schema is
    pinned per query START, so a query RESTARTED from the same
    checkpoint after an additive add resolves the CURRENT (widened)
    schema while the checkpointed offsets still give exactly-once rows
    — Delta's readStream behaves the same on restart. The parquet sink
    therefore holds mixed-schema files across the two runs; the
    downstream read needs mergeSchema (standard Spark), under which
    pre-add rows surface the new column as null.

    (An earlier version of this test asserted the OPPOSITE — that the
    second drain keeps the pre-add schema. That never held: Spark
    re-resolves a Python data source's schema at every load(); the
    assertion only passed when spark.read.parquet happened to sample a
    first-drain file for schema inference — a file-listing-order flake,
    caught when the full suite ran under load.)"""
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, "a", 4), batch_id=0)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    t.add_columns([T.StructField("tool", T.StringType(), True)])
    src = _rows(spark, "b", 3).withColumn("tool", F.lit("search"))
    t.merge(src, batch_id=1)
    # resumed drain: ONLY the new commit's rows (exactly-once), served
    # in the current widened schema
    _drain(spark, t.root, out, ckpt)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert got.count() == 7  # 4 + 3, nothing re-served
    assert "tool" in got.columns
    tools = {r["text"]: r["tool"] for r in got.collect()}
    assert tools["b-0"] == "search"
    assert tools["a-0"] is None  # pre-add file: projected null
    # a fresh query (new checkpoint) serves ALL rows in the new schema
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _drain(spark, t.root, out2, ckpt2)
    got2 = spark.read.parquet(out2)
    assert "tool" in got2.columns and got2.count() == 7
    tools2 = {r["text"]: r["tool"] for r in got2.collect()}
    assert tools2["b-0"] == "search" and tools2["a-0"] is None
