"""As-of join operator semantics."""

from __future__ import annotations

from etl_pipeline_spark.operators.asof import asof_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("a", 10, "p1"), ("a", 20, "p2"), ("a", 5, "p0"), ("b", 7, "p3")],
        "k string, t long, name string",
    )
    right = spark.createDataFrame(
        [("a", 10, "q10"), ("a", 15, "q15"), ("b", 99, "q99")],
        "k string, t long, quote string",
    )
    out = {
        r["name"]: (r["quote_asof"], r["t_asof"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["quote"],
        ).collect()
    }
    assert out["p1"] == ("q10", 10)  # inclusive: equal ts matches
    assert out["p2"] == ("q15", 15)  # latest ≤ 20
    assert out["p0"] == (None, None)  # nothing before t=5
    assert out["p3"] == (None, None)  # right exists but only later


def test_asof_plan_is_single_window_no_join(spark):
    from etl_pipeline_spark.plans.inspect import explain_str

    left = spark.createDataFrame([("a", 1, "x")], "k string, t long, v string")
    right = spark.createDataFrame([("a", 1, "y")], "k string, t long, w string")
    plan = explain_str(
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t")
    )
    # composition is union + window — no join node, no cartesian
    assert "CartesianProduct" not in plan
    assert "Window" in plan
