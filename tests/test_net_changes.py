"""Net-changes view (minilake.net_changes): classification on a
hand-built two-phase table exercising every class — I, U, D, plus the
two suppressions (born-then-died, rewritten-identical) — and the
replica law: applying the net feed as a change batch onto a replica
seeded with the FROM state must reproduce the TO state exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _merge(t, spark, rows, batch_id):
    df = spark.createDataFrame(rows, "k string, v string, lsn long, op string")
    t.merge(df, batch_id=batch_id)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("netch")
    t = MiniLakeTable.create(
        spark, str(tmp / "t"), SCHEMA, key_cols=["k"], n_buckets=4,
        write_mode="mor",
    )
    # batch 0 -> version 2: the FROM state
    _merge(t, spark, [
        ("upd", "old", 1, "I"),
        ("del", "doomed", 2, "I"),
        ("same", "stable", 3, "I"),
        ("rewrite", "identical", 4, "I"),
    ], 0)
    # batches 1-2 -> the window
    _merge(t, spark, [
        ("upd", "new", 10, "U"),
        ("del", None, 11, "D"),
        ("ins", "fresh", 12, "I"),
        ("ephemeral", "blink", 13, "I"),
        ("rewrite", "identical", 14, "U"),  # same payload, higher lsn
    ], 1)
    _merge(t, spark, [("ephemeral", None, 20, "D")], 2)
    return t


def test_classification(table):
    got = {
        r["k"]: (r["net_op"], r["v"], r["_lsn"])
        for r in table.net_changes(2).collect()
    }
    assert got == {
        "upd": ("U", "new", 10),
        "del": ("D", None, 11),
        "ins": ("I", "fresh", 12),
    }
    # suppressed: "same" (untouched), "ephemeral" (born+died in window),
    # "rewrite" (touched but net-identical)
    assert set(got) == {"upd", "del", "ins"}


def test_empty_window_is_empty(table):
    assert table.net_changes(table.current_version()).count() == 0


def test_tag_bounds(table):
    table.create_tag("from-state", 2)
    assert {r["k"] for r in table.net_changes("from-state").collect()} == {
        "upd", "del", "ins",
    }


def test_rename_between_bounds_uses_field_identity(spark, tmp_path):
    """A column renamed inside the window must diff against its own
    field's FROM value under the TO name — caught live: reading the FROM
    state under FROM names made the join unresolvable (and would have
    mis-diffed a swap)."""
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], n_buckets=2,
        write_mode="mor",
    )
    _merge(t, spark, [("a", "old", 1, "I"), ("b", "keep", 2, "I")], 0)
    v_from = t.current_version()
    t.rename_column("v", "w")
    _merge2 = spark.createDataFrame(
        [("a", "new", 10, "U")], "k string, w string, lsn long, op string"
    )
    t.merge(_merge2, batch_id=1)
    got = {
        r["k"]: (r["net_op"], r["w"]) for r in t.net_changes(v_from).collect()
    }
    # 'a' diffs old->new under the renamed column; 'b' untouched
    assert got == {"a": ("U", "new")}


def test_replica_law(table, spark, tmp_path):
    """FROM state + net feed == TO state, with ONE write per key."""
    replica = MiniLakeTable.create(
        spark, str(tmp_path / "replica"), SCHEMA, key_cols=["k"],
        n_buckets=4, write_mode="mor",
    )
    seed = table.read(version=2).withColumn("lsn", F.lit(0)).withColumn(
        "op", F.lit("I")
    )
    replica.merge(seed, batch_id=0)
    feed = table.net_changes(2).select(
        "k", "v", F.col("_lsn").alias("lsn"), F.col("net_op").alias("op")
    )
    replica.merge(feed, batch_id=1)
    got = {(r["k"], r["v"]) for r in replica.read().collect()}
    want = {(r["k"], r["v"]) for r in table.read().collect()}
    assert got == want


def test_envelope_before_images(table, spark):
    """with_before=True attaches each changed key's FROM-state payload:
    null on I, the old value on U and D — checked cell-for-cell against
    the FROM snapshot."""
    from_state = {r["k"]: r["v"] for r in table.read(version=2).collect()}
    env = {
        r["k"]: r
        for r in table.net_changes(2, with_before=True).collect()
    }
    assert set(env) == {"upd", "del", "ins"}
    assert env["ins"]["net_op"] == "I" and env["ins"]["before_v"] is None
    assert env["upd"]["net_op"] == "U"
    assert env["upd"]["before_v"] == from_state["upd"] == "old"
    assert env["del"]["net_op"] == "D"
    assert env["del"]["before_v"] == from_state["del"] == "doomed"


def test_envelope_reversal_law(table, spark, tmp_path):
    """TO state + REVERSED envelope == FROM state: I rows become
    deletes, U rows re-write the before image, D rows re-insert it —
    the consumer-side undo the before images exist for, with no second
    snapshot read."""
    replica = MiniLakeTable.create(
        spark, str(tmp_path / "rev"), SCHEMA, key_cols=["k"],
        n_buckets=4, write_mode="mor",
    )
    seed = table.read().withColumn("lsn", F.lit(0)).withColumn(
        "op", F.lit("I")
    )
    replica.merge(seed, batch_id=0)
    env = table.net_changes(2, with_before=True)
    undo = env.select(
        "k",
        F.when(F.col("net_op") != "I", F.col("before_v")).alias("v"),
        (F.col("_lsn") + 1_000_000).alias("lsn"),  # outranks the seed
        F.when(F.col("net_op") == "I", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    replica.merge(undo, batch_id=1)
    got = {(r["k"], r["v"]) for r in replica.read().collect()}
    want = {(r["k"], r["v"]) for r in table.read(version=2).collect()}
    assert got == want
