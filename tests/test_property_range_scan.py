"""Property-based range/box scans: for ARBITRARY column values —
negative doubles, infinities, NaN, nulls, pre-epoch timestamps — and
arbitrary bounds, pruned reads must equal exact filters, before and
after (z-order) clustering.

This hunts the bug class the deterministic grid tests cannot: a
mismatch between the footer-stats encoding (`_encode_stat_bound`), the
query-bound encoding (`_norm_bound`), and Spark's own comparison
semantics (NaN sorts above every double in Spark's total order but
compares false against range predicates; parquet writers may omit
min/max when NaN is present — the planner must then KEEP the file,
never guess)."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("n", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

finite = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)
weird = st.sampled_from(
    [float("nan"), float("inf"), float("-inf"), -0.0, 0.0, None]
)
score_strategy = st.one_of(finite, weird)
ts_strategy = st.one_of(
    st.none(),
    st.datetimes(
        min_value=datetime.datetime(1950, 1, 1),
        max_value=datetime.datetime(2100, 1, 1),
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(score_strategy, st.integers(-100, 100), ts_strategy),
        min_size=1,
        max_size=30,
    ),
    bounds=st.tuples(finite, finite),
    use_zorder=st.booleans(),
)
def test_range_scan_equals_filter_for_arbitrary_values(
    spark, tmp_path_factory, rows, bounds, use_zorder
):
    tmp = tmp_path_factory.mktemp("prop_rs")
    t = MiniLakeTable.create(
        spark, str(tmp / "t"), SCHEMA, key_cols=["k"],
        n_buckets=2, write_mode="mor",
    )
    t.set_stats_columns(["score", "n", "ts"])
    df = spark.createDataFrame(
        [
            (f"k{i}", s, n, ts, i + 1, "I")
            for i, (s, n, ts) in enumerate(rows)
        ],
        "k string, score double, n int, ts timestamp, lsn long, op string",
    )
    t.merge(df, batch_id=0)
    if use_zorder:
        t.compact(
            drop_tombstones=True,
            cluster_cols=["score", "n"],
            zorder=True,
            target_rows_per_file=4,
        )
    else:
        t.compact(
            drop_tombstones=True,
            cluster_cols=["score"],
            target_rows_per_file=4,
        )
    lo, hi = sorted(bounds)

    def exact(col, lo_v, hi_v):
        return sorted(
            map(
                tuple,
                t.read()
                .filter(
                    (F.col(col) >= F.lit(lo_v)) & (F.col(col) <= F.lit(hi_v))
                )
                .collect(),
            )
        )

    got = sorted(map(tuple, t.read_range("score", lo, hi).collect()))
    assert got == exact("score", lo, hi)
    # NaN/±inf never satisfy a finite closed range in the result
    for row in got:
        s = row[1]
        assert s is not None and not math.isnan(s) and lo <= s <= hi
    # box over (score, n): conjunction stays exact too
    box = sorted(
        map(
            tuple,
            t.read_box({"score": (lo, hi), "n": (-50, 50)}).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            t.read()
            .filter(
                (F.col("score") >= F.lit(lo)) & (F.col("score") <= F.lit(hi))
                & (F.col("n") >= -50) & (F.col("n") <= 50)
            )
            .collect(),
        )
    )
    assert box == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(ts_strategy, st.integers(-5, 5)),
        min_size=1,
        max_size=20,
    ),
    span=st.tuples(
        st.datetimes(
            min_value=datetime.datetime(1950, 1, 1),
            max_value=datetime.datetime(2100, 1, 1),
        ),
        st.datetimes(
            min_value=datetime.datetime(1950, 1, 1),
            max_value=datetime.datetime(2100, 1, 1),
        ),
    ),
)
def test_timestamp_range_scan_handles_pre_epoch(
    spark, tmp_path_factory, rows, span
):
    tmp = tmp_path_factory.mktemp("prop_ts")
    t = MiniLakeTable.create(
        spark, str(tmp / "t"), SCHEMA, key_cols=["k"],
        n_buckets=2, write_mode="mor",
    )
    t.set_stats_columns(["ts"])
    t.merge(
        spark.createDataFrame(
            [
                (f"k{i}", None, n, ts, i + 1, "I")
                for i, (ts, n) in enumerate(rows)
            ],
            "k string, score double, n int, ts timestamp, lsn long, "
            "op string",
        ),
        batch_id=0,
    )
    t.compact(
        drop_tombstones=True, cluster_cols=["ts"], target_rows_per_file=4
    )
    lo, hi = sorted(span)
    got = sorted(map(tuple, t.read_range("ts", lo, hi).collect()))
    want = sorted(
        map(
            tuple,
            t.read()
            .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
            .collect(),
        )
    )
    assert got == want
