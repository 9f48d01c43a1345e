"""Snapshot profile drift: exact mode audits any two snapshots with two
scans; stats mode diffs stored ANALYZE manifests with zero scans and
surfaces staleness instead of hiding it."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.lake.monitor import (
    check_drift,
    profile_drift,
    schema_drift,
)
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA

KEYS = ["conv_id", "turn_idx"]
COLS = ["conv_id", "role", "text"]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=4, write_mode="mor",
    )
    t.merge(_ev(spark, [
        ("a", 0, "user", "hi", None, 1, "I"),
        ("a", 1, "assistant", "hello", None, 2, "I"),
        ("b", 0, "user", None, None, 3, "I"),
    ]), batch_id=0)
    return t


def _by_col(df):
    return {r["col_name"]: r for r in df.collect()}


def test_exact_drift_reports_per_column_deltas(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    # second batch: new conv, an overwrite, and a delete
    t.merge(_ev(spark, [
        ("c", 0, "user", "new conv", None, 10, "I"),
        ("a", 0, "user", "hi edited", None, 11, "U"),
        ("b", 0, None, None, None, 12, "D"),
    ]), batch_id=1)

    d = _by_col(profile_drift(t, v_from=v1, columns=COLS))
    r = d["conv_id"]
    assert (r["rows_from"], r["rows_to"], r["rows_delta"]) == (3, 3, 0)
    assert (r["ndv_from"], r["ndv_to"], r["ndv_delta"]) == (2, 2, 0)
    # text: null b-row deleted, 'hi'→'hi edited', 'new conv' added
    rt = d["text"]
    assert (rt["nulls_from"], rt["nulls_to"], rt["nulls_delta"]) == (1, 0, -1)
    assert rt["ndv_delta"] == 1  # {hi, hello} -> {hi edited, hello, new conv}


def test_default_columns_are_the_schema_intersection(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    t.add_columns([T.StructField("extra", T.StringType(), True)])
    d = profile_drift(t, v_from=v1)
    names = {r["col_name"] for r in d.collect()}
    # 'extra' exists only at v_to: excluded from the default column set
    assert "extra" not in names
    assert {"conv_id", "turn_idx", "role", "text", "ts"} <= names
    # but asking for it explicitly is a clear error, not a silent null
    with pytest.raises(ValueError, match="absent from the v_from"):
        profile_drift(t, v_from=v1, columns=["extra"])


def test_stats_mode_is_metadata_only_and_tracks_staleness(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.analyze(columns=COLS)
    v1 = t.current_version()
    t.merge(_ev(spark, [
        ("c", 0, "user", "new conv", None, 10, "I"),
    ]), batch_id=1)
    t.analyze(columns=COLS)

    d = _by_col(profile_drift(t, v_from=v1, columns=COLS, mode="stats"))
    r = d["conv_id"]
    assert (r["rows_from"], r["rows_to"], r["rows_delta"]) == (3, 4, 1)
    # ndv at this tiny scale is exact under HLL++ rsd 0.01
    assert (r["ndv_from"], r["ndv_to"], r["ndv_delta"]) == (2, 3, 1)
    # staleness surfaced: each side names the version it was computed at
    assert r["stats_at_from"] < v1 <= r["stats_at_to"]

    # the drift diff itself is read-only: no snapshot was committed
    assert t.current_version() == r["stats_at_to"] + 1


def test_stats_mode_fails_clearly_without_analyze(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    with pytest.raises(ValueError, match="no ANALYZE stats"):
        profile_drift(t, v_from=v1, mode="stats")
    t.analyze(columns=["conv_id"])
    with pytest.raises(ValueError, match="not covered by the stats"):
        profile_drift(
            t, v_from=t.current_version(), columns=["text"], mode="stats"
        )


def test_drift_past_retention_horizon_fails_clearly(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    for b in (1, 2, 3):
        t.merge(_ev(spark, [
            (f"x{b}", 0, "user", f"row {b}", None, 10 + b, "I"),
        ]), batch_id=b)
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    with pytest.raises(ValueError, match="expired by retention GC"):
        profile_drift(t, v_from=v1, columns=COLS)
    # the current snapshot still profiles against itself
    v = t.current_version()
    d = _by_col(profile_drift(t, v_from=v, v_to=v, columns=COLS))
    assert d["conv_id"]["rows_from"] == 6


def test_schema_drift_resolves_through_physical_identity(spark, tmp_path):
    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields
        + [T.StructField("score", T.IntegerType(), True)]
    )
    t = MiniLakeTable.create(
        spark, str(tmp_path / "s"), schema, key_cols=KEYS,
        n_buckets=2, write_mode="mor",
    )
    v1 = t.current_version()
    t.rename_column("tool", "tool_name")       # metadata-only rename
    t.widen_column_type("score", T.LongType())
    t.drop_column("role")
    t.add_columns([T.StructField("lang", T.StringType(), True)])

    changes = {
        (c["change"], c["column"]): c for c in schema_drift(t, v_from=v1)
    }
    assert changes[("renamed", "tool_name")]["from_name"] == "tool"
    assert changes[("widened", "score")]["from_type"] == "int"
    assert changes[("widened", "score")]["to_type"] == "bigint"
    assert ("dropped", "role") in changes
    assert changes[("added", "lang")]["to_type"] == "string"
    # a rename is a rename — never reported as drop + add
    assert ("dropped", "tool") not in changes
    assert ("added", "tool_name") not in changes
    # identical snapshots: no drift
    v = t.current_version()
    assert schema_drift(t, v_from=v, v_to=v) == []


def test_check_drift_gates_and_passes(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    # within tolerance: +1 row on 3 = 33%
    t.merge(_ev(spark, [
        ("c", 0, "user", "new conv", None, 10, "I"),
    ]), batch_id=1)
    ok = check_drift(
        t, v_from=v1, columns=COLS, max_rows_delta_pct=0.5,
        forbid_schema_changes=True,
    )
    assert ok["ok"] and ok["findings"] == []
    # tighter gate trips on the same delta
    bad = check_drift(
        t, v_from=v1, columns=COLS, max_rows_delta_pct=0.2,
    )
    assert not bad["ok"]
    assert bad["findings"][0]["kind"] == "rows-drift"
    assert bad["findings"][0]["delta_pct"] > 0.2
    # schema gate: a DDL between the versions is a finding
    t.add_columns([T.StructField("lang", T.StringType(), True)])
    sch = check_drift(
        t, v_from=v1, columns=COLS, forbid_schema_changes=True,
    )
    assert not sch["ok"]
    assert {f["kind"] for f in sch["findings"]} == {"schema-change"}
    # zero-to-something growth is infinite drift, violating any gate
    t.merge(_ev(spark, [
        ("b", 1, None, "was all null before", None, 11, "I"),
    ]), batch_id=2)
    inf = check_drift(
        t, v_from=v1, columns=["role"], max_nulls_delta_pct=1000.0,
    )
    assert not inf["ok"]
    # JSON-clean unbounded-drift encoding (float('inf') is not JSON)
    assert inf["findings"][0]["delta_pct"] == "inf"
    import json

    json.loads(json.dumps(inf, allow_nan=False))  # strict-JSON safe


def test_check_drift_stats_mode_flags_stale_stats(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.analyze(columns=COLS)
    v1 = t.current_version()
    # table grows WITHOUT a re-ANALYZE: the stored stats go stale
    for b in (1, 2, 3):
        t.merge(_ev(spark, [
            (f"g{b}", 0, "user", f"row {b}", None, 20 + b, "I"),
        ]), batch_id=b)
    rep = check_drift(
        t, v_from=v1, columns=COLS, mode="stats",
        max_rows_delta_pct=0.01,
    )
    assert not rep["ok"]
    kinds = {f["kind"] for f in rep["findings"]}
    # the stale numbers show no row drift — the staleness finding is
    # what stops the gate from green-lighting exactly that blind spot
    assert "stale-stats" in kinds
    stale = [f for f in rep["findings"] if f["kind"] == "stale-stats"]
    assert any(f["side"] == "to" for f in stale)
    # re-ANALYZE at the head: the same gate now sees the real drift
    t.analyze(columns=COLS)
    rep2 = check_drift(
        t, v_from=v1, columns=COLS, mode="stats",
        max_rows_delta_pct=0.01,
    )
    assert not rep2["ok"]
    assert any(f["kind"] == "rows-drift" for f in rep2["findings"])


def test_check_drift_refuses_gates_without_profile(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    with pytest.raises(ValueError, match="non-empty"):
        profile_drift(t, v_from=v1, columns=[])
    with pytest.raises(ValueError, match="non-empty"):
        check_drift(t, v_from=v1, columns=[], max_rows_delta_pct=0.1)
    # rename EVERY column between the versions: the default by-name
    # intersection is empty — a requested gate must refuse loudly, not
    # return ok=True with nothing judged
    for old, new in (("conv_id", "cid"), ("turn_idx", "tix"),
                     ("role", "r"), ("text", "txt"), ("tool", "tl"),
                     ("ts", "t0")):
        t.rename_column(old, new)
    with pytest.raises(ValueError, match="no columns were"):
        check_drift(t, v_from=v1, max_rows_delta_pct=0.1)


def test_exact_matches_stats_on_identical_snapshots(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.analyze(columns=COLS)
    v = t.current_version()
    exact = _by_col(profile_drift(t, v_from=v, v_to=v, columns=COLS))
    stats = _by_col(profile_drift(t, v_from=v, v_to=v, columns=COLS,
                                  mode="stats"))
    for c in COLS:
        assert exact[c]["rows_from"] == stats[c]["rows_from"]
        assert exact[c]["nulls_from"] == stats[c]["nulls_from"]
        assert exact[c]["ndv_from"] == stats[c]["ndv_from"]  # tiny: HLL exact
        assert exact[c]["rows_delta"] == 0 and stats[c]["rows_delta"] == 0
