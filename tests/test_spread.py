"""Bucket→shuffle-partition spread (lake/minilake._spread_expr).

The optimization: ``repartition(n, bucket)`` hash-collides the ~n
distinct bucket ids (32→32 leaves ~45% of partitions empty and 3-bucket
stragglers); the spread token places every bucket in its own partition
while keeping the single-Exchange clustered-reduce plan. These tests pin
the machinery it rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.lake.minilake import (
    BUCKET_COL,
    DEAD_BUCKET,
    SPREAD_COL,
    _murmur3_int,
    _spread_expr,
    _spread_tokens,
)


def test_murmur3_matches_spark_hash(spark):
    """The driver-side token search assumes _murmur3_int == F.hash for
    IntegerType — bit-exact, including negatives and extremes."""
    vals = list(range(-40, 300)) + [2**31 - 1, -(2**31), 123456789]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v int")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    for r in rows:
        assert r["h"] == _murmur3_int(r["v"]), r["v"]


def test_spread_tokens_bijective():
    for n in (1, 2, 7, 16, 32, 33, 64):
        toks = _spread_tokens(n)
        assert len(toks) == n
        assert sorted(_murmur3_int(t) % n for t in toks) == list(range(n))


def test_spread_expr_one_bucket_per_partition(spark):
    """After repartition(n, spread_token) every bucket occupies its own
    shuffle partition — no collisions, no empty slots."""
    n = 32
    df = (
        spark.range(10_000)
        .select((F.col("id") % n).cast("int").alias(BUCKET_COL))
        .withColumn(SPREAD_COL, _spread_expr(list(range(n)), n))
        .repartition(n, F.col(SPREAD_COL))
        .select(BUCKET_COL, F.spark_partition_id().alias("p"))
        .distinct()
        .collect()
    )
    part_of = {}
    for r in df:
        part_of.setdefault(r[BUCKET_COL], set()).add(r["p"])
    assert all(len(ps) == 1 for ps in part_of.values())
    assert len({next(iter(ps)) for ps in part_of.values()}) == n


def test_spread_expr_sparse_and_dead(spark):
    """Sparse bucket subsets (partial compaction) and the dead-letter
    pseudo-bucket each get their own partition."""
    touched = [3, 11, 28]
    df = (
        spark.createDataFrame(
            [(b,) for b in touched + [DEAD_BUCKET]], f"{BUCKET_COL} int"
        )
        .withColumn(
            SPREAD_COL,
            _spread_expr(touched, len(touched) + 1, dead_token=True),
        )
        .repartition(len(touched) + 1, F.col(SPREAD_COL))
        .select(BUCKET_COL, F.spark_partition_id().alias("p"))
        .collect()
    )
    parts = {r[BUCKET_COL]: r["p"] for r in df}
    assert len(set(parts.values())) == len(touched) + 1
