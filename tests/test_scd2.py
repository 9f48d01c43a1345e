"""SCD Type-2 derivation (operators/scd2.py): interval semantics on a
hand-built changelog, plus the reconstruction law — filtering the
history by interval containment at ANY lsn must equal the LWW state at
that lsn (the property that makes the output a temporal table rather
than just an annotated event log)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.lww import lww_reduce
from etl_pipeline_spark.operators.scd2 import scd2_history

EVENTS = [
    # key a: I -> U -> U (still live)
    ("a", 1, "I", "v1"),
    ("a", 3, "U", "v2"),
    ("a", 7, "U", "v3"),
    # key b: I -> D (closed by the delete, no current row)
    ("b", 2, "I", "w1"),
    ("b", 5, "D", None),
    # key c: I -> D -> I (delete then re-insert: two disjoint intervals)
    ("c", 4, "I", "x1"),
    ("c", 6, "D", None),
    ("c", 9, "I", "x2"),
]


@pytest.fixture(scope="module")
def hist(spark):
    df = spark.createDataFrame(EVENTS, "k string, lsn long, op string, v string")
    return scd2_history(df, keys=["k"], payload_cols=["v"]).collect()


def _rows(hist, k):
    return sorted(
        (r for r in hist if r["k"] == k), key=lambda r: r["valid_from_lsn"]
    )


def test_update_chain_closes_intervals(hist):
    a = _rows(hist, "a")
    assert [(r["v"], r["valid_from_lsn"], r["valid_to_lsn"]) for r in a] == [
        ("v1", 1, 3), ("v2", 3, 7), ("v3", 7, None),
    ]
    assert [r["is_current"] for r in a] == [False, False, True]


def test_delete_closes_without_opening(hist):
    b = _rows(hist, "b")
    assert [(r["v"], r["valid_from_lsn"], r["valid_to_lsn"]) for r in b] == [
        ("w1", 2, 5),
    ]
    assert not b[0]["is_current"]


def test_delete_then_reinsert_disjoint_intervals(hist):
    c = _rows(hist, "c")
    assert [(r["v"], r["valid_from_lsn"], r["valid_to_lsn"]) for r in c] == [
        ("x1", 4, 6), ("x2", 9, None),
    ]
    assert [r["is_current"] for r in c] == [False, True]


@pytest.mark.parametrize("at_lsn", [0, 1, 2, 4, 5, 6, 8, 9, 100])
def test_point_in_time_reconstruction(spark, at_lsn):
    """history ∩ [lsn] == LWW over events with lsn <= at_lsn — for every
    boundary in the fixture, including before the first event and after
    the last."""
    df = spark.createDataFrame(EVENTS, "k string, lsn long, op string, v string")
    hist = scd2_history(df, keys=["k"], payload_cols=["v"])
    via_hist = {
        (r["k"], r["v"])
        for r in hist.filter(
            (F.col("valid_from_lsn") <= at_lsn)
            & (
                F.col("valid_to_lsn").isNull()
                | (F.col("valid_to_lsn") > at_lsn)
            )
        ).collect()
    }
    red = lww_reduce(
        df.filter(F.col("lsn") <= at_lsn), keys=["k"], payload_cols=["op", "v"]
    )
    via_lww = {
        (r["k"], r["v"])
        for r in red.filter(F.col("op") != "D").collect()
    }
    assert via_hist == via_lww
