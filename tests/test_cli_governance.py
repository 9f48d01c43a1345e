"""CLI verbs for the session-9 surfaces: ``--mode drift`` (snapshot
profile deltas, exact or zero-scan stats), ``--mode mask`` /
``--mode row-filter`` (governance policy admin), and the maintenance
verbs ``--mode compact`` / ``--mode gc``. Driven in-process with
injected argv, asserting the one-JSON-line output contract."""

from __future__ import annotations

import json
import sys

import run_ingest
from etl_pipeline_spark.lake.masking import read_masked
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA

KEYS = ["conv_id", "turn_idx"]


def _cli(monkeypatch, capsys, *argv):
    monkeypatch.setattr(sys, "argv", ["run_ingest.py", *argv])
    code = 0
    try:
        run_ingest.main()
    except SystemExit as e:
        code = int(e.code or 0)
    out = [
        line for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    assert len(out) == 1, f"expected one JSON line, got {out}"
    return code, json.loads(out[0])


def _table(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=2, write_mode="mor",
    )
    t.merge(
        spark.createDataFrame(
            [("a", 0, "user", "one", None, 1, "I"),
             ("b", 0, "user", "two", None, 2, "I")],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=0,
    )
    return t


def test_cli_drift(spark, tmp_path, monkeypatch, capsys):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [("c", 0, "user", "three", None, 3, "I")],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=1,
    )
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "drift",
        "--from-version", str(v1), "--analyze-columns", "conv_id,text",
    )
    assert code == 0 and rep["mode"] == "exact"
    by_col = {c["col_name"]: c for c in rep["columns"]}
    assert by_col["conv_id"]["rows_delta"] == 1
    assert by_col["conv_id"]["ndv_delta"] == 1


def test_cli_drift_gate_exit_codes(spark, tmp_path, monkeypatch, capsys):
    t = _table(spark, tmp_path)
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [("c", 0, "user", "three", None, 3, "I")],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=1,
    )
    # +1 row on 2 = 50%: loose gate passes (exit 0), tight gate fails
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "drift",
        "--from-version", str(v1), "--analyze-columns", "conv_id",
        "--max-rows-delta-pct", "0.9",
    )
    assert code == 0 and rep["ok"] and rep["schema_changes"] == []
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "drift",
        "--from-version", str(v1), "--analyze-columns", "conv_id",
        "--max-rows-delta-pct", "0.2",
    )
    assert code == 1 and not rep["ok"]
    assert rep["findings"][0]["kind"] == "rows-drift"


def test_cli_compact_and_gc(spark, tmp_path, monkeypatch, capsys):
    t = _table(spark, tmp_path)
    for b in (1, 2, 3):
        t.merge(
            spark.createDataFrame(
                [(f"c{b}", 0, "user", f"row {b}", None, 10 + b, "I")],
                "conv_id string, turn_idx int, role string, text string, "
                "ts timestamp, lsn long, op string",
            ),
            batch_id=b,
        )
    state_before = sorted(
        (r["conv_id"], r["turn_idx"]) for r in t.read().collect()
    )
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "compact",
        "--cluster-cols", "conv_id",
    )
    assert code == 0 and rep["cluster_cols"] == ["conv_id"]
    assert rep["files"] <= 2  # delta chains folded, one dir per bucket
    assert sorted(
        (r["conv_id"], r["turn_idx"]) for r in t.read().collect()
    ) == state_before

    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "gc",
        "--keep-last", "1", "--orphan-min-age-s", "0",
    )
    assert code == 0 and rep["manifests_removed"] > 0
    assert sorted(
        (r["conv_id"], r["turn_idx"]) for r in t.read().collect()
    ) == state_before


def test_cli_mask_and_row_filter(spark, tmp_path, monkeypatch, capsys):
    t = _table(spark, tmp_path)
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "mask",
        "--column", "text", "--mask-kind", "null",
    )
    assert code == 0 and rep["policies"] == {"text": "null"}
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "row-filter",
        "--where", "conv_id = 'a'",
    )
    assert code == 0 and rep["row_filter"] == "conv_id = 'a'"
    got = read_masked(t).collect()
    assert [(r["conv_id"], r["text"]) for r in got] == [("a", None)]
    # drop both
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "mask",
        "--column", "text", "--mask-kind", "none",
    )
    assert code == 0 and rep["policies"] == {}
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"), "--mode", "row-filter",
    )
    assert code == 0 and rep["row_filter"] is None
    assert read_masked(t).count() == 2
