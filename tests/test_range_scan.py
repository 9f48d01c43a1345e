"""Manifest-stats range scans (Iceberg scan-planning analog).

``set_stats_columns`` records per-FILE min/max bounds for declared
secondary columns in every commit's manifest; ``read_range`` plans a
range scan from those bounds alone — per-file pruning where the
snapshot state makes that sound (COW, or MOR with every dir a
compaction/rescale rewrite), per-bucket pruning under unresolved MOR
deltas, and no pruning at all on the 'agg' merge engine. Every test
here pins the invariant that pruning NEVER changes the result:
``read_range(col, lo, hi) ≡ read().filter(lo <= col <= hi)``.

The central soundness trap (regression-pinned below): per-file pruning
under unresolved deltas could drop a file holding a key's LWW WINNER
(out of range) while keeping a delta with a stale in-range loser — the
fold would resurrect the loser. Bucket granularity is immune: all
versions of a key hash to one bucket.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _ts(h: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)


def _rows(spark, triples):
    """(conv_id, ts_hour, lsn[, op]) -> change frame."""
    full = [x if len(x) == 4 else x + ("U",) for x in triples]
    return spark.createDataFrame(
        [
            (c, 0, "user", f"t-{c}-{lsn}", _ts(h), lsn, op)
            for c, h, lsn, op in full
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path, name="t", **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("write_mode", "mor")
    t = MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        **kw,
    )
    t.set_stats_columns(["ts"])
    return t


def _assert_equiv(t, col, lo, hi):
    exact = t.read()
    if lo is not None:
        exact = exact.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        exact = exact.filter(F.col(col) <= F.lit(hi))
    want = sorted(map(tuple, exact.collect()))
    got = sorted(map(tuple, t.read_range(col, lo, hi).collect()))
    assert got == want
    return len(want)


def test_winner_out_loser_in_is_never_resurrected(spark, tmp_path):
    """THE soundness trap: key k's v1 sits in [lo,hi], a later v2 moved
    it out. Under unresolved deltas the plan must be bucket-granular
    (a per-file prune of v2's file would resurrect v1); the result must
    exclude k entirely."""
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, [("k", 10, 1), ("other", 500, 2)]), batch_id=0)
    t.merge(_rows(spark, [("k", 900, 3)]), batch_id=1)  # winner OUT of range
    lo, hi = _ts(0), _ts(100)
    plan = t.plan_range_scan("ts", lo, hi)
    assert plan["mode"] == "bucket"
    n = _assert_equiv(t, "ts", lo, hi)
    assert n == 0  # k's winner is out of range; 'other' too
    ids = {r["conv_id"] for r in t.read_range("ts", lo, hi).collect()}
    assert "k" not in ids


def test_bucket_pruning_prunes_and_matches(spark, tmp_path):
    """Distinct keys land in distinct buckets; batches with disjoint ts
    spans let bucket pruning actually drop work under deltas."""
    t = _table(spark, tmp_path, n_buckets=8)
    # 3 in-range keys touch at most 3 buckets; 40 out-of-range keys
    # touch (almost) all 8 — buckets holding ONLY out-of-range files
    # must be dropped from the plan
    t.merge(_rows(spark, [(f"a{i}", i, i) for i in range(3)]), batch_id=0)
    t.merge(
        _rows(spark, [(f"b{i}", 1000 + i, 100 + i) for i in range(40)]),
        batch_id=1,
    )
    plan = t.plan_range_scan("ts", _ts(0), _ts(50))
    assert plan["mode"] == "bucket"
    assert plan["files_planned"] < plan["files_total"]
    _assert_equiv(t, "ts", _ts(0), _ts(50))


def test_clustered_compaction_gives_file_pruning(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, [(f"c{i}", i, i) for i in range(400)]), batch_id=0)
    # move a slice out of range so equivalence is non-trivial
    t.merge(
        _rows(spark, [(f"c{i}", 5000 + i, 10_000 + i) for i in range(50)]),
        batch_id=1,
    )
    t.compact(drop_tombstones=True, cluster_cols=["ts"], target_rows_per_file=50)
    plan = t.plan_range_scan("ts", _ts(100), _ts(200))
    assert plan["mode"] == "file"
    assert plan["files_planned"] < plan["files_total"], plan
    n = _assert_equiv(t, "ts", _ts(100), _ts(200))
    assert n == 101  # c100..c200 (c0..c49 moved out but that's below 100)
    # moved keys must not reappear in their OLD span
    ids = {
        r["conv_id"]
        for r in t.read_range("ts", _ts(0), _ts(60)).collect()
    }
    assert ids == {f"c{i}" for i in range(50, 61)}


def test_open_bounds_and_no_declaration(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "plain"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=2, write_mode="mor",
    )
    t.merge(_rows(spark, [(f"c{i}", i, i) for i in range(10)]), batch_id=0)
    # no set_stats_columns -> mode none, still exact
    plan = t.plan_range_scan("ts", _ts(3), None)
    assert plan["mode"] == "none"
    _assert_equiv(t, "ts", _ts(3), None)
    _assert_equiv(t, "ts", None, _ts(7))


def test_pre_declaration_files_are_kept_until_compact(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "late"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=2, write_mode="mor",
    )
    t.merge(_rows(spark, [(f"c{i}", i, i) for i in range(10)]), batch_id=0)
    t.set_stats_columns(["ts"])
    t.merge(
        _rows(spark, [(f"d{i}", 1000 + i, 100 + i) for i in range(10)]),
        batch_id=1,
    )
    # batch-0 dirs carry no bounds -> their buckets are always kept
    plan = t.plan_range_scan("ts", _ts(0), _ts(20))
    assert plan["mode"] == "bucket"
    _assert_equiv(t, "ts", _ts(0), _ts(20))
    t.compact(drop_tombstones=True, cluster_cols=["ts"], target_rows_per_file=5)
    plan2 = t.plan_range_scan("ts", _ts(0), _ts(20))
    assert plan2["mode"] == "file"
    assert plan2["files_planned"] < plan2["files_total"]
    _assert_equiv(t, "ts", _ts(0), _ts(20))


def test_null_ts_rows_never_match_and_all_null_files_prune(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_rows(spark, [(f"c{i}", i, i) for i in range(10)]), batch_id=0)
    nulls = spark.createDataFrame(
        [(f"n{i}", 0, "user", "x", None, 100 + i, "I") for i in range(10)],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(nulls, batch_id=1)
    _assert_equiv(t, "ts", _ts(0), _ts(100))
    t.compact(drop_tombstones=True, cluster_cols=["ts"], target_rows_per_file=5)
    # after compaction the all-null rows cluster together; their files
    # record "empty"/null-excluded bounds and a ts range never plans them
    plan = t.plan_range_scan("ts", _ts(0), _ts(100))
    assert plan["mode"] == "file"
    ids = {r["conv_id"] for r in t.read_range("ts", _ts(0), _ts(100)).collect()}
    assert ids == {f"c{i}" for i in range(10)}


def test_agg_engine_never_prunes(spark, tmp_path):
    """Sum-folded values can land IN range though every physical part is
    outside it — any stats pruning would drop the key. Engine must plan
    mode 'none' and still return the folded row."""
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
    t.set_stats_columns(["score"])
    src = "conv_id string, turn_idx int, score long, lsn long, op string"
    t.merge(spark.createDataFrame([("k", 0, 40, 1, "I")], src), batch_id=0)
    t.merge(spark.createDataFrame([("k", 0, 40, 2, "U")], src), batch_id=1)
    # parts are 40 and 40; folded score is 80. Range [70, 90] contains
    # NO physical value — pruning at any granularity would lose k.
    plan = t.plan_range_scan("score", 70, 90)
    assert plan["mode"] == "none"
    got = t.read_range("score", 70, 90).collect()
    assert [(r["conv_id"], r["score"]) for r in got] == [("k", 80)]


def test_partial_engine_bucket_and_file_modes(spark, tmp_path):
    """Partial-coalesce winners are physical row values, so both pruning
    tiers stay sound for merge_engine='partial'."""
    t = _table(spark, tmp_path, name="part", merge_engine="partial")
    t.merge(_rows(spark, [(f"c{i}", i, i) for i in range(30)]), batch_id=0)
    # partial update that does NOT touch ts (null ts = keep previous)
    upd = spark.createDataFrame(
        [(f"c{i}", 0, None, f"new-{i}", None, 100 + i, "U") for i in range(5)],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(upd, batch_id=1)
    assert t.plan_range_scan("ts", _ts(0), _ts(10))["mode"] == "bucket"
    _assert_equiv(t, "ts", _ts(0), _ts(10))
    t.compact(drop_tombstones=True, cluster_cols=["ts"], target_rows_per_file=5)
    plan = t.plan_range_scan("ts", _ts(0), _ts(10))
    assert plan["mode"] == "file"
    assert plan["files_planned"] < plan["files_total"]
    _assert_equiv(t, "ts", _ts(0), _ts(10))
    # the partially-updated rows keep their ORIGINAL ts and new text
    got = {
        r["conv_id"]: r["text"]
        for r in t.read_range("ts", _ts(0), _ts(4)).collect()
    }
    assert got == {f"c{i}": f"new-{i}" for i in range(5)}


def test_string_stats_column_and_rename_follows(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "s"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=2, write_mode="mor",
    )
    t.set_stats_columns(["role", "ts"])
    t.merge(
        spark.createDataFrame(
            [(f"c{i}", 0, chr(97 + i % 26) + "-role", "x", _ts(i), i, "I")
             for i in range(40)],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=0,
    )
    t.compact(drop_tombstones=True, cluster_cols=["role"], target_rows_per_file=8)
    plan = t.plan_range_scan("role", "a", "c")
    assert plan["mode"] == "file"
    assert plan["files_planned"] < plan["files_total"]
    _assert_equiv(t, "role", "a", "c-zzzz")
    # rename: declaration follows the logical name, bounds stay valid
    # (they are keyed on the physical name, which never changes)
    t.rename_column("role", "speaker")
    assert "speaker" in t.stats_columns() and "role" not in t.stats_columns()
    plan2 = t.plan_range_scan("speaker", "a", "c")
    assert plan2["mode"] == "file"
    assert plan2["files_planned"] == plan["files_planned"]
    _assert_equiv(t, "speaker", "a", "c-zzzz")


def test_drop_column_removes_declaration(spark, tmp_path):
    t = _table(spark, tmp_path, name="d")
    t.merge(_rows(spark, [("a", 1, 1)]), batch_id=0)
    t.drop_column("ts")
    assert t.stats_columns() == []
    with pytest.raises(ValueError, match="no column"):
        t.plan_range_scan("ts", _ts(0), _ts(5))


def test_set_stats_columns_validates(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "v"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=2,
    )
    with pytest.raises(ValueError, match="no column"):
        t.set_stats_columns(["nope"])


def test_cow_tables_prune_per_file(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "cow"), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=2, write_mode="cow",
    )
    t.set_stats_columns(["ts"])
    t.merge(_rows(spark, [(f"c{i}", i, i) for i in range(20)]), batch_id=0)
    plan = t.plan_range_scan("ts", _ts(0), _ts(5))
    # COW state is key-unique on disk from the first commit
    assert plan["mode"] == "file"
    _assert_equiv(t, "ts", _ts(0), _ts(5))
