"""Property tests: as-of join tie contract and range-join degenerate
widths against DuckDB on adversarial randomized fixtures (r3 verdict
item 8).

- asof_join documents that right-side ties (duplicate (key, ts)) must be
  pre-collapsed by the caller; under that contract the result must equal
  DuckDB's ASOF JOIN on the same (collapsed) inputs, including duplicate
  LEFT timestamps and left/right ts collisions.
- range_join_bucketed with lower == upper degenerates to an exact-offset
  match; it and arbitrary (lower <= upper) windows must equal the DuckDB
  inequality join, including negative windows and fractional widths.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_spark.operators.asof import asof_join
from etl_pipeline_spark.operators.ranges import range_join_bucketed

# adversarial: tiny key/ts domains force duplicate timestamps and
# left/right ts collisions in almost every example
KEYS = ["a", "b"]
left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 12)),
    min_size=1, max_size=10,
)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 12), st.integers(0, 99)),
    min_size=0, max_size=10,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_duckdb_under_tie_contract(spark, lrows, rrows):
    # caller-side tie collapse: one row per (key, ts), max payload wins —
    # the documented precondition (asof.py:36-38)
    collapsed = {}
    for k, t, v in rrows:
        collapsed[(k, t)] = max(collapsed.get((k, t), -1), v)
    rrows_c = [(k, t, v) for (k, t), v in sorted(collapsed.items())]
    lrows_id = [(i, k, t) for i, (k, t) in enumerate(lrows)]

    left = spark.createDataFrame(lrows_id, "lid long, k string, t long")
    right = spark.createDataFrame(
        rrows_c or [("zz", -1, -1)], "k string, t long, v long"
    )
    if not rrows_c:
        right = right.filter("k <> 'zz'")
    got = {
        r["lid"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_payload=["v"],
        ).collect()
    }

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows_id, columns=["lid", "k", "t"]))
    con.register(
        "r", pd.DataFrame(rrows_c, columns=["k", "t", "v"])
        if rrows_c else pd.DataFrame({"k": pd.Series(dtype=str),
                                      "t": pd.Series(dtype="int64"),
                                      "v": pd.Series(dtype="int64")})
    )
    exp_df = con.execute(
        "SELECT l.lid, r.t AS rt, r.v AS rv FROM l "
        "ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t"
    ).df()
    exp = {
        int(row["lid"]): (
            None if pd.isna(row["rt"]) else int(row["rt"]),
            None if pd.isna(row["rv"]) else int(row["rv"]),
        )
        for _, row in exp_df.iterrows()
    }
    assert got == exp


windows = st.one_of(
    st.tuples(st.integers(-6, 6), st.just(0)).map(lambda x: (x[0], x[0])),
    st.tuples(st.integers(-6, 6), st.integers(0, 6)).map(
        lambda x: (x[0], x[0] + x[1])
    ),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lrows=left_rows, rrows=right_rows, window=windows)
def test_range_join_matches_duckdb_incl_degenerate_width(
    spark, lrows, rrows, window
):
    lower, upper = window
    lrows_id = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    rrows_v = [(k, t, v) for k, t, v in rrows]
    left = spark.createDataFrame(lrows_id, "lid long, k string, t long")
    right = spark.createDataFrame(
        rrows_v or [("zz", -99, -1)], "k string, rt long, v long"
    )
    if not rrows_v:
        right = right.filter("k <> 'zz'")
    got = sorted(
        (r["lid"], r["rt"], r["v"])
        for r in range_join_bucketed(
            left, right, on=["k"], left_ts="t", right_ts="rt",
            lower=lower, upper=upper,
        ).collect()
    )
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows_id, columns=["lid", "k", "t"]))
    con.register(
        "r", pd.DataFrame(rrows_v, columns=["k", "rt", "v"])
        if rrows_v else pd.DataFrame({"k": pd.Series(dtype=str),
                                      "rt": pd.Series(dtype="int64"),
                                      "v": pd.Series(dtype="int64")})
    )
    exp = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.execute(
            f"SELECT l.lid, r.rt, r.v FROM l JOIN r ON l.k = r.k "
            f"AND r.rt >= l.t + ({lower}) AND r.rt <= l.t + ({upper})"
        ).fetchall()
    )
    assert got == exp
