"""Z-order clustered compaction (Delta ``OPTIMIZE ZORDER BY`` /
Iceberg rewrite_data_files z-order strategy analog).

``compact(cluster_cols=[a, b], zorder=True)`` interleaves the bits of
the 16-bit min/max-normalized ranks of the cluster columns and range
splits + sorts the output on that z-value, so each file covers a tight
HYPER-RECTANGLE of the clustered dimensions instead of a tight span of
only the leading one. The payoff is that :meth:`read_range` prunes
files on EVERY clustered dimension — linear multi-column clustering
gives the non-leading dimensions near-full-range file bounds and no
pruning. Everything is pure Column arithmetic (shiftleft/shiftright/
bitwiseOR inside whole-stage codegen); the only driver work is one
min/max agg row per compaction.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _ts(h: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)


def _grid(spark, n_ts=16, n_turn=16):
    """An (n_ts x n_turn) grid: every (ts-hour, turn_idx) cell occupied,
    so file bounds on either dimension directly expose the layout."""
    rows = [
        (f"c{i}", j, "user", f"t-{i}-{j}", _ts(i), i * n_turn + j + 1, "I")
        for i in range(n_ts)
        for j in range(n_turn)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path, name):
    t = MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=2,
        write_mode="mor",
    )
    t.set_stats_columns(["ts", "turn_idx"])
    t.merge(_grid(spark), batch_id=0)
    return t


def _assert_equiv(t, col, lo, hi):
    exact = (
        t.read()
        .filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
        .collect()
    )
    got = t.read_range(col, lo, hi).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exact))
    return len(got)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    t = _table(spark, tmp_path, "z")
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        zorder=True,
        target_rows_per_file=16,
    )
    for col, lo, hi, want in [
        ("ts", _ts(0), _ts(3), 4 * 16),
        ("turn_idx", 0, 3, 4 * 16),
    ]:
        plan = t.plan_range_scan(col, lo, hi)
        assert plan["mode"] == "file"
        assert plan["files_planned"] < plan["files_total"], (col, plan)
        assert _assert_equiv(t, col, lo, hi) == want


def test_zorder_beats_linear_on_second_dimension(spark, tmp_path):
    zt = _table(spark, tmp_path, "zo")
    zt.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        zorder=True,
        target_rows_per_file=16,
    )
    lin = _table(spark, tmp_path, "lin")
    lin.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        target_rows_per_file=16,
    )
    zp = zt.plan_range_scan("turn_idx", 0, 3)
    lp = lin.plan_range_scan("turn_idx", 0, 3)
    # linear clustering leads on ts: every file spans (nearly) the whole
    # turn_idx range, so the second dimension prunes (almost) nothing;
    # the z-layout's rectangles prune strictly more
    assert zp["files_planned"] < lp["files_planned"], (zp, lp)
    _assert_equiv(zt, "turn_idx", 0, 3)
    _assert_equiv(lin, "turn_idx", 0, 3)


def test_zorder_null_values_cluster_and_never_match(spark, tmp_path):
    t = _table(spark, tmp_path, "n")
    nulls = spark.createDataFrame(
        [(f"n{i}", 0, "user", "x", None, 10_000 + i, "I") for i in range(8)],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(nulls, batch_id=1)
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        zorder=True,
        target_rows_per_file=16,
    )
    _assert_equiv(t, "ts", _ts(0), _ts(3))
    ids = {r["conv_id"] for r in t.read_range("ts", _ts(0), _ts(200)).collect()}
    assert not any(i.startswith("n") for i in ids)


def test_zorder_validates(spark, tmp_path):
    from pyspark.sql import types as T

    t = _table(spark, tmp_path, "v")
    with pytest.raises(ValueError, match="at least two"):
        t.compact(cluster_cols=["ts"], zorder=True)
    with pytest.raises(ValueError, match="zorder"):
        t.compact(zorder=True)
    # a type with no order-preserving double view still rejects
    tb = MiniLakeTable.create(
        spark, str(tmp_path / "vb"),
        T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("flag", T.BooleanType(), True),
        ]),
        key_cols=KEYS, n_buckets=2, write_mode="mor",
    )
    with pytest.raises(ValueError, match="numeric, timestamp, date"):
        tb.compact(cluster_cols=["turn_idx", "flag"], zorder=True)


def test_zorder_string_dimension_prunes(spark, tmp_path):
    """Strings are z-orderable via their 6-byte-prefix rank: with
    conv_id as the SECOND clustered dimension (the one linear
    clustering can't prune), a conv_id range scan must both equal the
    exact filter and skip files."""
    t = _table(spark, tmp_path, "zs")
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "conv_id"],
        zorder=True,
        target_rows_per_file=16,
    )
    t.set_stats_columns(["ts", "conv_id"])
    # re-collect per-file bounds for the string column
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "conv_id"],
        zorder=True,
        target_rows_per_file=16,
    )
    plan = t.plan_range_scan("conv_id", "c0", "c3zzz")
    assert plan["mode"] == "file"
    assert plan["files_planned"] < plan["files_total"], plan
    exact = sorted(
        map(
            tuple,
            t.read()
            .filter(
                (F.col("conv_id") >= "c0") & (F.col("conv_id") <= "c3zzz")
            )
            .collect(),
        )
    )
    got = sorted(
        map(tuple, t.read_range("conv_id", "c0", "c3zzz").collect())
    )
    assert got == exact and len(got) > 0


def test_zorder_survives_single_output_file(spark, tmp_path):
    """n_out == n_buckets path (no range split): the z sort still runs
    within partitions; results stay exact."""
    t = _table(spark, tmp_path, "one")
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        zorder=True,
        target_rows_per_file=1_000_000,
    )
    _assert_equiv(t, "turn_idx", 2, 9)
    _assert_equiv(t, "ts", _ts(1), _ts(5))


def test_box_scan_prunes_multiplicatively_on_zorder(spark, tmp_path):
    t = _table(spark, tmp_path, "box")
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        zorder=True,
        target_rows_per_file=16,
    )
    p_ts = t.plan_range_scan("ts", _ts(0), _ts(3))
    p_ti = t.plan_range_scan("turn_idx", 0, 3)
    box = t.plan_box_scan({"ts": (_ts(0), _ts(3)), "turn_idx": (0, 3)})
    assert box["mode"] == "file"
    # the conjunction can never plan MORE than either dimension alone,
    # and on a z-layout the 4x16 + 16x4 bands overlap in ~a 4x4 corner
    assert box["files_planned"] <= min(
        p_ts["files_planned"], p_ti["files_planned"]
    )
    exact = (
        t.read()
        .filter(
            (F.col("ts") >= F.lit(_ts(0))) & (F.col("ts") <= F.lit(_ts(3)))
            & (F.col("turn_idx") >= 0) & (F.col("turn_idx") <= 3)
        )
        .collect()
    )
    got = t.read_box(
        {"ts": (_ts(0), _ts(3)), "turn_idx": (0, 3)}
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exact))
    assert len(got) == 16  # the 4x4 corner of the grid


def test_box_scan_undeclared_column_filters_but_still_prunes_on_others(
    spark, tmp_path
):
    t = _table(spark, tmp_path, "mix")  # stats cols: ts, turn_idx
    t.compact(
        drop_tombstones=True,
        cluster_cols=["ts", "turn_idx"],
        zorder=True,
        target_rows_per_file=16,
    )
    # 'text' is not a declared stats column: it cannot prune, but the
    # declared ts bound still must
    box = t.plan_box_scan({"ts": (_ts(0), _ts(3)), "text": ("t-0", "t-9")})
    assert box["mode"] == "file"
    assert box["files_planned"] < box["files_total"]
    got = t.read_box({"ts": (_ts(0), _ts(3)), "text": ("t-0", "t-9")})
    exact = t.read().filter(
        (F.col("ts") >= F.lit(_ts(0))) & (F.col("ts") <= F.lit(_ts(3)))
        & (F.col("text") >= "t-0") & (F.col("text") <= "t-9")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exact.collect())
    )
