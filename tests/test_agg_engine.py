"""Aggregation merge engine (operators/agg_engine.py + minilake
merge_engine='agg'): in-table sum/min/max/last maintained by the merge
itself, proven against a sequential Python model under arbitrary batch
splits, duplicate delivery, compaction, rename, and replication."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("n", T.LongType(), True),       # sum
        T.StructField("hi", T.DoubleType(), True),    # max
        T.StructField("label", T.StringType(), True), # last
    ]
)
SPEC = {"n": "sum", "hi": "max", "label": "last"}


def _mk(spark, tmp, name="t", write_mode="mor"):
    return MiniLakeTable.create(
        spark, str(tmp / name), SCHEMA, key_cols=["k"], n_buckets=4,
        write_mode=write_mode, merge_engine="agg", agg_spec=SPEC,
    )


def _apply(t, spark, events, batch_id):
    """events: (k, lsn, n, hi, label)"""
    df = spark.createDataFrame(
        [(k, n, hi, lb, lsn, "U") for (k, lsn, n, hi, lb) in events],
        "k string, n long, hi double, label string, lsn long, op string",
    )
    t.merge(df, batch_id=batch_id)


def model_state(events):
    out = {}
    for k, lsn, n, hi, lb in sorted(events, key=lambda e: e[1]):
        s = out.setdefault(k, {"n": None, "hi": None, "label": (-1, None)})
        if n is not None:
            s["n"] = (s["n"] or 0) + n
        if hi is not None:
            s["hi"] = hi if s["hi"] is None else max(s["hi"], hi)
        if lb is not None and lsn > s["label"][0]:
            s["label"] = (lsn, lb)
    return {
        k: {"n": s["n"], "hi": s["hi"], "label": s["label"][1]}
        for k, s in out.items()
    }


def _table_state(t):
    return {
        r["k"]: {"n": r["n"], "hi": r["hi"], "label": r["label"]}
        for r in t.read().collect()
    }


FIXTURE = [
    ("a", 1, 2, 0.5, "x"),
    ("a", 4, 3, 0.1, None),     # label not provided: stays x
    ("a", 7, None, 0.9, "y"),   # n not provided: stays 5
    ("b", 2, 10, None, "only"),
]
EXPECTED = {
    "a": {"n": 5, "hi": 0.9, "label": "y"},
    "b": {"n": 10, "hi": None, "label": "only"},
}


def test_fixture_single_batch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE, 0)
    assert _table_state(t) == EXPECTED == model_state(FIXTURE)


def test_fixture_multi_batch_compact_and_cow(spark, tmp_path):
    for mode in ("mor", "cow"):
        t = _mk(spark, tmp_path, name=f"t_{mode}", write_mode=mode)
        _apply(t, spark, FIXTURE[2:], 0)   # out-of-order arrival
        if mode == "mor":
            t.compact(drop_tombstones=False)
        _apply(t, spark, FIXTURE[:2], 1)
        assert _table_state(t) == EXPECTED, mode
        if mode == "mor":
            t.compact(drop_tombstones=False)
            assert _table_state(t) == EXPECTED


def test_duplicate_delivery_deduped(spark, tmp_path):
    """The same (key, lsn) event delivered twice in one batch counts
    ONCE — sums are not redelivery-idempotent, so the merge dedups."""
    t = _mk(spark, tmp_path)
    _apply(t, spark, [("a", 1, 5, 1.0, "x"), ("a", 1, 5, 1.0, "x")], 0)
    assert _table_state(t)["a"]["n"] == 5
    # cross-batch redelivery of the whole batch is fenced
    _apply(t, spark, [("a", 1, 5, 1.0, "x")], 0)
    assert _table_state(t)["a"]["n"] == 5


def test_delete_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [("a", 1, 0.0, "x", 1, "D")],
        "k string, n long, hi double, label string, lsn long, op string",
    )
    with pytest.raises(ValueError, match="cannot retract"):
        t.merge(df, batch_id=0)


def test_rename_keeps_spec_by_physical_name(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE[:2], 0)
    t.rename_column("n", "total")
    df = spark.createDataFrame(
        [("a", 4, 3, "U")], "k string, total long, lsn long, op string"
    )
    t.merge(df, batch_id=1)
    got = {r["k"]: r["total"] for r in t.read().collect()}
    assert got["a"] == 9  # 2 + 3 + 4: still a SUM under the new name


def test_replication_converges(spark, tmp_path):
    """export_changes re-expands agg fold rows: partial sums travel as
    deltas, `last` columns at their true write-LSNs; a replica replaying
    the export equals the primary — including the same-LSN collision
    case (label written at the key's max LSN rides the base event)."""
    from etl_pipeline_spark.lake.replicate import export_changes
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.streaming.ingest import replay_files

    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE[:2], 0)
    _apply(t, spark, FIXTURE[2:], 1)   # label 'y' at a's max lsn (7)
    out = str(tmp_path / "export")
    export_changes(t, out)
    replica = _mk(spark, tmp_path, name="replica")
    replay_files(
        spark, out, replica, cfg=ApplyConfig(key_cols=["k"], clean_cols=())
    )
    assert _table_state(replica) == _table_state(t) == EXPECTED


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.sampled_from([1, 2, None]),                 # n (sum)
        st.sampled_from([0.25, 0.75, None]),           # hi (max)
        st.sampled_from(["x", "y", None]),             # label (last)
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=events_strategy, splits=st.lists(st.integers(1, 12), max_size=2))
def test_random_interleavings_match_model(spark, tmp_path_factory, evs, splits):
    events = [
        (k, lsn, n, hi, lb) for lsn, (k, n, hi, lb) in enumerate(evs, 1)
    ]
    cuts = sorted({min(s, len(events)) for s in splits})
    bounds = [0] + cuts + [len(events)]
    batches = [
        events[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if hi > lo
    ]
    t = _mk(spark, tmp_path_factory.mktemp("agg"))
    for i, chunk in enumerate(batches):
        _apply(t, spark, chunk, i)
    t.compact(drop_tombstones=False)
    assert _table_state(t) == model_state(events)
