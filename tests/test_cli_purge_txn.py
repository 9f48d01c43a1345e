"""CLI verbs for the session-8 surfaces: ``--mode purge`` (the
right-to-be-forgotten sweep over a table) and ``--mode recover-txns``
(multi-table transaction recovery over a catalog). Driven in-process
with injected argv — ``get_spark`` reuses the test session — asserting
the one-JSON-line output contract and the exit-code semantics
(recover-txns exits nonzero while a committed txn stays pending)."""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import types as T

import run_ingest
from etl_pipeline_spark.lake.catalog import MiniLakeCatalog
from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


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


def test_cli_purge(spark, tmp_path, monkeypatch, capsys):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=2, write_mode="mor",
    )
    t.merge(
        spark.createDataFrame(
            [("evil", 0, "secret", 1, "I"), ("ok", 0, "fine", 2, "I")],
            "conv_id string, turn_idx int, text string, lsn long, op string",
        ),
        batch_id=0,
    )
    code, rep = _cli(
        monkeypatch, capsys,
        "--table", str(tmp_path / "t"),
        "--mode", "purge", "--where", "conv_id = 'evil'",
    )
    assert code == 0 and rep["verified"] and rep["rows_deleted"] == 1
    assert t.read().count() == 1


def test_cli_purge_requires_where(spark, tmp_path, monkeypatch, capsys):
    MiniLakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=2,
    )
    monkeypatch.setattr(
        sys, "argv",
        ["run_ingest.py", "--table", str(tmp_path / "t"),
         "--mode", "purge"],
    )
    with pytest.raises(SystemExit) as e:
        run_ingest.main()
    assert e.value.code == 2  # argparse usage error


def test_cli_recover_txns(spark, tmp_path, monkeypatch, capsys):
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    cat.create_table(
        "prod.t", SCHEMA, key_cols=["conv_id", "turn_idx"],
        n_buckets=2, write_mode="mor",
    )
    txn = cat.transaction(txn_id="crashed")
    txn.merge(
        "prod.t",
        spark.createDataFrame(
            [("c1", 0, "x", 1, "I")],
            "conv_id string, turn_idx int, text string, lsn long, op string",
        ),
        batch_id=0,
    )
    del txn  # crash before the commit point
    code, rep = _cli(
        monkeypatch, capsys,
        "--catalog", str(tmp_path / "lake"), "--mode", "recover-txns",
    )
    assert code == 0 and rep == {
        "aborted": ["crashed"], "completed": [], "pending": [],
    }
    assert cat.load_table("prod.t").read().count() == 0


def test_cli_recover_txns_pending_exits_nonzero(
    spark, tmp_path, monkeypatch, capsys
):
    import glob
    import os

    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    cat.create_table(
        "prod.t", SCHEMA, key_cols=["conv_id", "turn_idx"],
        n_buckets=2, write_mode="mor",
    )
    txn = cat.transaction(txn_id="stuck")
    txn.merge(
        "prod.t",
        spark.createDataFrame(
            [("c1", 0, "x", 1, "I")],
            "conv_id string, turn_idx int, text string, lsn long, op string",
        ),
        batch_id=0,
    )
    # past the commit point with the staged files destroyed: the
    # unrecoverable skew must page the operator (exit 1), not vanish
    txn._write_record(dict(txn._doc, state="committed"))
    t = cat.load_table("prod.t")
    for p in glob.glob(os.path.join(t.meta_dir, "staged", "*.json")):
        os.remove(p)
    code, rep = _cli(
        monkeypatch, capsys,
        "--catalog", str(tmp_path / "lake"), "--mode", "recover-txns",
    )
    assert code == 1 and rep["pending"]
