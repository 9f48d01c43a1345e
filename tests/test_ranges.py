"""Bucketed range join: semantics on crafted rows + plan shape."""

from __future__ import annotations

from etl_pipeline_spark.operators.ranges import range_join_bucketed
from etl_pipeline_spark.plans.inspect import explain_str


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 1000), (2, "u1", 5000), (3, "u2", 1000), (4, "u3", 100)],
        "pid long, user string, t long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 900),   # within [t-3600, t] of pid 1 only
            ("u1", 4999),  # within pid 2 only
            ("u1", 5001),  # after pid 2 → matches nothing
            ("u2", -3000), # long before pid 3 → nothing
        ],
        "user string, rt long",
    )
    return left, right


def test_range_join_inner_exact_window(spark):
    left, right = _frames(spark)
    out = range_join_bucketed(
        left, right, on=["user"], left_ts="t", right_ts="rt",
        lower=-3600, upper=0,
    )
    got = sorted((r["pid"], r["rt"]) for r in out.collect())
    assert got == [(1, 900), (2, 4999)]
    # boundary inclusivity: rt == t and rt == t - 3600 both match
    exact = range_join_bucketed(
        spark.createDataFrame([(9, "u", 4600)], "pid long, user string, t long"),
        spark.createDataFrame([("u", 1000), ("u", 4600)], "user string, rt long"),
        on=["user"], left_ts="t", right_ts="rt", lower=-3600, upper=0,
    )
    assert sorted(r["rt"] for r in exact.collect()) == [1000, 4600]


def test_range_join_left_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = range_join_bucketed(
        left, right, on=["user"], left_ts="t", right_ts="rt",
        lower=-3600, upper=0, how="left",
    )
    rows = out.collect()
    assert len(rows) == 4  # 2 matches + pids 3 and 4 unmatched with null rt
    assert {r["pid"] for r in rows if r["rt"] is None} == {3, 4}


def test_range_join_is_equi_join_not_nested_loop(spark):
    left, right = _frames(spark)
    plan = explain_str(
        range_join_bucketed(
            left, right, on=["user"], left_ts="t", right_ts="rt",
            lower=-3600, upper=0,
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
