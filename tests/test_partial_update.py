"""Partial-update merge engine (operators/partial_update.py +
minilake merge_engine='partial'): column-coalescing apply with
delete-reset semantics, proven equal to a sequential Python model under
ARBITRARY batch splits, interleaved compaction, and both write modes —
the associativity claim the design rests on."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.StringType(), True),
        T.StructField("b", T.StringType(), True),
    ]
)


def _apply(t, spark, events, batch_id):
    """events: list of (k, lsn, op, a, b) — None payload = not provided."""
    df = spark.createDataFrame(
        [(k, a, b, lsn, op) for (k, lsn, op, a, b) in events],
        "k string, a string, b string, lsn long, op string",
    )
    t.merge(df, batch_id=batch_id)


def model_state(events):
    """Sequential reference: per key, per column last non-null value
    after the key's last delete; live iff some event follows the last
    delete."""
    by_key = {}
    for k, lsn, op, a, b in sorted(events, key=lambda e: e[1]):
        st_ = by_key.setdefault(k, {"reset": -1, "vals": {}, "last": -1})
        st_["last"] = max(st_["last"], lsn)
        if op == "D":
            st_["reset"] = max(st_["reset"], lsn)
        else:
            for col, v in (("a", a), ("b", b)):
                if v is not None:
                    st_["vals"][col] = (lsn, v)
    out = {}
    for k, s in by_key.items():
        if s["last"] <= s["reset"] and s["reset"] >= 0:
            continue  # trailing delete -> tombstoned
        out[k] = {
            col: (v if lsn > s["reset"] else None)
            for col, (lsn, v) in s["vals"].items()
        }
        out[k].setdefault("a", None)
        out[k].setdefault("b", None)
        out[k] = {c: v for c, v in out[k].items()}
    return out


def _table_state(t):
    return {
        r["k"]: {"a": r["a"], "b": r["b"]} for r in t.read().collect()
    }


def _mk(spark, tmp, write_mode="mor"):
    return MiniLakeTable.create(
        spark, str(tmp / f"t_{write_mode}"), SCHEMA, key_cols=["k"],
        n_buckets=4, write_mode=write_mode, merge_engine="partial",
    )


FIXTURE = [
    # key p: insert full, then two partial updates touching one col each
    ("p", 1, "I", "a1", "b1"),
    ("p", 5, "U", "a2", None),   # b stays b1
    ("p", 9, "U", None, "b2"),   # a stays a2
    # key q: delete resets — later partial update resurrects ONLY its col
    ("q", 2, "I", "qa", "qb"),
    ("q", 6, "D", None, None),
    ("q", 8, "U", None, "qb2"),  # a must NOT resurrect as 'qa'
    # key r: trailing delete -> tombstoned
    ("r", 3, "I", "ra", "rb"),
    ("r", 7, "D", None, None),
    # key s: stale update below the tombstone loses
    ("s", 10, "D", None, None),
    ("s", 4, "U", "sa", None),
]

EXPECTED = {
    "p": {"a": "a2", "b": "b2"},
    "q": {"a": None, "b": "qb2"},
}


def test_fixture_semantics_mor(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE, 0)
    assert _table_state(t) == EXPECTED
    assert _table_state(t) == model_state(FIXTURE)


def test_fixture_semantics_multi_batch_and_compact(spark, tmp_path):
    """Same events split into adversarial batches (the resurrecting
    update arrives BEFORE the delete it must survive), compacted
    mid-stream and after — fold associativity on a live table."""
    t = _mk(spark, tmp_path)
    _apply(t, spark, [e for e in FIXTURE if e[1] in (8, 9, 10)], 0)
    t.compact(drop_tombstones=False)
    _apply(t, spark, [e for e in FIXTURE if e[1] in (2, 3, 4)], 1)
    _apply(t, spark, [e for e in FIXTURE if e[1] in (1, 5, 6, 7)], 2)
    assert _table_state(t) == EXPECTED
    t.compact(drop_tombstones=False)
    assert _table_state(t) == EXPECTED


def test_fixture_semantics_cow(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="cow")
    for i, chunk in enumerate(
        [FIXTURE[:3], FIXTURE[3:6], FIXTURE[6:]]
    ):
        _apply(t, spark, chunk, i)
    assert _table_state(t) == EXPECTED


def test_tombstone_registry_and_changes_feed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE, 0)
    stones = {r["k"]: r["_lsn"] for r in t.read_tombstones().collect()}
    assert stones == {"r": 7, "s": 10}
    # the change feed carries fold-layout rows a downstream partial
    # table can re-fold
    ch = t.read_changes_since(1)
    assert "_vl_a" in ch.columns and "_reset_lsn" in ch.columns


def test_schema_evolution_adds_vl_sibling(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE[:3], 0)
    t.add_columns([T.StructField("c", T.StringType(), True)])
    df = spark.createDataFrame(
        [("p", "c1", 20, "U")], "k string, c string, lsn long, op string"
    )
    t.merge(df, batch_id=1)
    row = {r["k"]: r for r in t.read().collect()}["p"]
    # old columns carried from pre-evolution events; new column applied
    assert (row["a"], row["b"], row["c"]) == ("a2", "b2", "c1")


def test_point_lookup_and_net_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, FIXTURE[:4], 0)   # lsn 1,5,9 (p), 2 (q)
    v0 = t.current_version()
    _apply(t, spark, FIXTURE[4:], 1)
    got = {r["k"]: r["a"] for r in t.read_for_keys(["p", "q"]).collect()}
    assert got == {"p": "a2", "q": None}
    nc = {r["k"]: (r["net_op"], r["a"], r["b"]) for r in t.net_changes(v0).collect()}
    # q: delete-then-partial-update nets to U with the TO state (a reset
    # to null, b from the post-delete write). r and s are born (and die)
    # INSIDE the window — suppressed. p untouched in the window.
    assert nc == {"q": ("U", None, "qb2")}


def test_dead_letter_fusion_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert not t.supports_dead_letter_fusion
    df = spark.createDataFrame(
        [("k1", "a", "b", 1, "I", True)],
        "k string, a string, b string, lsn long, op string, ok boolean",
    )
    with pytest.raises(ValueError, match="lww merge engine"):
        t.merge(df, batch_id=0, valid_col="ok", dead_sink=str(tmp_path / "dlq"))


def test_replication_decomposes_fold_rows(spark, tmp_path):
    """export_changes on a partial table re-expands fold rows into
    single-column events; a replica replaying them converges to the
    primary state, and a late per-column straggler then lands IDENTICALLY
    on both — the property a whole-row max-LSN image would break."""
    from etl_pipeline_spark.lake.replicate import export_changes
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.streaming.ingest import replay_files

    cfg = ApplyConfig(key_cols=["k"], clean_cols=())

    t = _mk(spark, tmp_path)
    # two batches so one key's fold row spans columns written at
    # different LSNs: a@lsn1 folded with b@lsn9 in separate deltas,
    # then compact to ONE fold row per key
    _apply(t, spark, FIXTURE[:3], 0)
    _apply(t, spark, FIXTURE[3:], 1)
    t.compact(drop_tombstones=False)

    out = str(tmp_path / "export")
    export_changes(t, out)
    replica = MiniLakeTable.create(
        spark, str(tmp_path / "replica"), SCHEMA, key_cols=["k"],
        n_buckets=4, write_mode="mor", merge_engine="partial",
    )
    replay_files(spark, out, replica, cfg=cfg)
    assert _table_state(replica) == _table_state(t)

    # straggler: lsn 3 beats p.b's true write-LSN (1) but not p.a's (5).
    # On a whole-row snapshot image p would carry max-LSN 9 everywhere
    # and wrongly fence this event on the replica.
    straggler = [("p", 3, "U", None, "b-straggler")]
    _apply(t, spark, straggler, 2)
    df = spark.createDataFrame(
        [("p", None, "b-straggler", 3, "U")],
        "k string, a string, b string, lsn long, op string",
    )
    replica.merge(df, batch_id=2)
    assert _table_state(replica) == _table_state(t)
    assert _table_state(t)["p"] == {"a": "a2", "b": "b2"}  # b2@9 still wins
    # and a straggler that DOES beat a column's write-LSN applies on both
    _apply(t, spark, [("q", 7, "U", "qa-mid", None)], 3)
    df2 = spark.createDataFrame(
        [("q", "qa-mid", None, 7, "U")],
        "k string, a string, b string, lsn long, op string",
    )
    replica.merge(df2, batch_id=3)
    assert _table_state(replica) == _table_state(t)
    assert _table_state(t)["q"] == {"a": "qa-mid", "b": "qb2"}


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),                 # key
        st.sampled_from(["I", "U", "D"]),                 # op
        st.sampled_from(["x", "y", None]),                # col a
        st.sampled_from(["u", "v", None]),                # col b
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=events_strategy,
    splits=st.lists(st.integers(1, 14), max_size=3),
    data=st.data(),
)
def test_random_interleavings_match_model(
    spark, tmp_path_factory, evs, splits, data
):
    """Random event sequences, random batch splits, compaction at a
    random point: engine state == sequential model. Delete events carry
    junk payload on purpose — a tombstone must ignore it."""
    events = [
        (k, lsn, op, a if op != "D" else "junk", b)
        for lsn, (k, op, a, b) in enumerate(evs, start=1)
    ]
    # model must not see the junk payload either (D ignores payload)
    model_events = [
        (k, lsn, op, None if op == "D" else a, None if op == "D" else b)
        for (k, lsn, op, a, b) in events
    ]
    cuts = sorted({min(s, len(events)) for s in splits})
    bounds = [0] + cuts + [len(events)]
    batches = [
        events[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if hi > lo
    ]
    compact_at = data.draw(
        st.integers(0, len(batches)), label="compact_after_batch"
    )
    tmp = tmp_path_factory.mktemp("pu")
    t = _mk(spark, tmp)
    for i, chunk in enumerate(batches):
        _apply(t, spark, chunk, i)
        if i + 1 == compact_at:
            t.compact(drop_tombstones=False)
    assert _table_state(t) == model_state(model_events)
