"""Incremental materialized-view maintenance: partial recompute off the
change feed must equal a from-scratch recompute after every refresh,
tombstone fully-deleted keys, and be idempotent via the fence-watermark."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.materialize import refresh_keyed_aggregate
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog
from etl_pipeline_spark.streaming.ingest import replay_files

KEYS = ["conv_id", "turn_idx"]

VIEW_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_roles", T.LongType(), True),
        T.StructField("last_ts_epoch", T.LongType(), True),
    ]
)


def _agg(live):
    return live.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.max(F.unix_timestamp("ts")).alias("last_ts_epoch"),
    )


def _tables(spark, tmp_path):
    src = MiniLakeTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=8, write_mode="mor",
    )
    view = MiniLakeTable.create(
        spark, str(tmp_path / "view"), VIEW_SCHEMA, key_cols=["conv_id"],
        n_buckets=4, write_mode="mor",
    )
    return src, view


def _snap(df):
    return {
        r["conv_id"]: (r["n_turns"], r["n_roles"], r["last_ts_epoch"])
        for r in df.collect()
    }


def test_incremental_refresh_equals_recompute(spark, tmp_path):
    cfg = GenConfig(n_events=6_000, batch_size=1_000, shuffle_window=200)
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    src, view = _tables(spark, tmp_path)

    # three replay chunks, a refresh after each — every refresh folds
    # only the versions since the previous one (fence-watermark)
    for stop in (2, 4, None):
        replay_files(spark, clog, src, stop_after=stop)
        res = refresh_keyed_aggregate(src, view, _agg)
        assert res is not None and not res.skipped
        assert _snap(view.read()) == _snap(_agg(src.read()))

    # already current → no-op
    assert refresh_keyed_aggregate(src, view, _agg) is None


def test_fully_deleted_key_is_tombstoned_in_view(spark, tmp_path):
    src, view = _tables(spark, tmp_path)

    def ev(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        )

    src.merge(ev([("a", 0, "user", "x", None, 1, "I"),
                  ("a", 1, "assistant", "y", None, 2, "I"),
                  ("b", 0, "user", "z", None, 3, "I")]), batch_id=0)
    refresh_keyed_aggregate(src, view, _agg)
    assert set(_snap(view.read())) == {"a", "b"}
    assert _snap(view.read())["a"][0] == 2

    # delete BOTH of a's turns → a must vanish from the view
    src.merge(ev([("a", 0, None, None, None, 10, "D"),
                  ("a", 1, None, None, None, 11, "D")]), batch_id=1)
    refresh_keyed_aggregate(src, view, _agg)
    assert set(_snap(view.read())) == {"b"}
    # and the view carries a real tombstone (auditable delete)
    assert [r["conv_id"] for r in view.read_tombstones().collect()] == ["a"]


def test_refresh_is_idempotent_via_fence(spark, tmp_path):
    src, view = _tables(spark, tmp_path)
    src.merge(
        spark.createDataFrame(
            [("a", 0, "user", "x", None, 1, "I")],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=0,
    )
    v = src.current_version()
    res1 = refresh_keyed_aggregate(src, view, _agg, to_version=v)
    assert res1 is not None and not res1.skipped
    # replaying the same refresh (crash/retry) is a no-op
    assert refresh_keyed_aggregate(src, view, _agg, to_version=v) is None
    before = view.current_version()
    assert view.current_version() == before
    assert _snap(view.read())["a"] == (1, 1, None)
