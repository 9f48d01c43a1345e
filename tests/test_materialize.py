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


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


# --- interplay with source maintenance (compaction, retention GC) --------


def test_refresh_straddles_source_compaction(spark, tmp_path):
    """A refresh whose (watermark, head] window contains a source
    compaction must stay exact: compaction rewrites are maintenance, not
    changes — read_changes_since excludes them and still serves the
    folded-away delta files (no vacuum)."""
    import pytest

    cfg = GenConfig(
        n_events=6_000, batch_size=1_000, shuffle_window=200,
        op_mix=(0.5, 0.3, 0.2), seed=11,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    src, view = _tables(spark, tmp_path)

    replay_files(spark, clog, src, stop_after=2)
    refresh_keyed_aggregate(src, view, _agg)

    replay_files(spark, clog, src, stop_after=4)
    src.compact(drop_tombstones=False)  # fold mid-window
    replay_files(spark, clog, src)

    res = refresh_keyed_aggregate(src, view, _agg)
    assert res is not None
    assert _snap(view.read()) == _snap(_agg(src.read()))

    # a compact with NO new merges is maintenance-only: the follow-up
    # refresh advances the watermark but changes nothing
    src.compact(drop_tombstones=False)
    before = _snap(view.read())
    refresh_keyed_aggregate(src, view, _agg)
    assert _snap(view.read()) == before == _snap(_agg(src.read()))


def test_refresh_past_retention_horizon_raises_then_reseeds(spark, tmp_path):
    """Source retention GC that drops the watermark's manifest must fail
    the incremental refresh with the clear retention error, and
    reseed_keyed_aggregate must recover: full recompute, stale view keys
    tombstoned, incremental refreshes resuming from the re-seed point."""
    import pytest

    from etl_pipeline_spark.lake.materialize import reseed_keyed_aggregate

    src, view = _tables(spark, tmp_path)
    src.merge(_ev(spark, [("a", 0, "user", "x", None, 1, "I"),
                          ("a", 1, "assistant", "y", None, 2, "I"),
                          ("b", 0, "user", "z", None, 3, "I")]), batch_id=0)
    refresh_keyed_aggregate(src, view, _agg)
    assert set(_snap(view.read())) == {"a", "b"}

    # source advances many versions while the view sleeps; 'a' is fully
    # deleted along the way
    for i in range(6):
        src.merge(
            _ev(spark, [(f"c{i}", 0, "user", f"t{i}", None, 10 + i, "I")]),
            batch_id=i + 1,
        )
    src.merge(_ev(spark, [("a", 0, None, None, None, 50, "D"),
                          ("a", 1, None, None, None, 51, "D")]), batch_id=7)
    src.expire_snapshots(keep_last=2)

    with pytest.raises(ValueError, match="retention"):
        refresh_keyed_aggregate(src, view, _agg)

    res = reseed_keyed_aggregate(src, view, _agg)
    assert res is not None and not res.skipped
    assert _snap(view.read()) == _snap(_agg(src.read()))
    assert set(_snap(view.read())) == {"b"} | {f"c{i}" for i in range(6)}
    # the stale 'a' row left as an auditable tombstone, not an absence
    assert "a" in {r["conv_id"] for r in view.read_tombstones().collect()}

    # incremental maintenance resumes from the re-seed watermark
    assert refresh_keyed_aggregate(src, view, _agg) is None  # current
    src.merge(_ev(spark, [("b", 1, "user", "w", None, 60, "I")]),
              batch_id=8)
    res = refresh_keyed_aggregate(src, view, _agg)
    assert res is not None and not res.skipped
    assert _snap(view.read()) == _snap(_agg(src.read()))
    assert _snap(view.read())["b"][0] == 2


# --- concurrency: writers merging while refreshes fold -------------------


def test_concurrent_writers_and_refreshes_converge(spark, tmp_path):
    """Two writers replaying the same stream into the source while TWO
    refreshers fold the view concurrently: every CAS loser retries (MOR
    merge conflict path) or lands as a fenced skip; after a final
    refresh the view equals a from-scratch recompute."""
    import threading

    from etl_pipeline_spark.pipeline import ApplyConfig

    cfg = GenConfig(
        n_events=6_000, batch_size=1_000, shuffle_window=200,
        dup_delivery_rate=0.02, seed=13,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    src, view = _tables(spark, tmp_path)

    errors: list[Exception] = []
    done = threading.Event()
    barrier = threading.Barrier(4)

    def writer():
        barrier.wait()
        try:
            replay_files(
                spark, clog, src,
                cfg=ApplyConfig(auto_compact_max_files=4),
            )
        except Exception as e:  # pragma: no cover - assertion target
            errors.append(e)

    def refresher():
        barrier.wait()
        try:
            while not done.is_set():
                refresh_keyed_aggregate(src, view, _agg)
        except Exception as e:  # pragma: no cover - assertion target
            errors.append(e)

    writers = [threading.Thread(target=writer) for _ in range(2)]
    refreshers = [threading.Thread(target=refresher) for _ in range(2)]
    for t in refreshers + writers:
        t.start()
    for t in writers:
        t.join()
    done.set()
    for t in refreshers:
        t.join()
    assert not errors, errors

    refresh_keyed_aggregate(src, view, _agg)  # fold the tail
    assert _snap(view.read()) == _snap(_agg(src.read()))
