"""Projected reads: ``read(columns=...)`` must equal the full read's
projection under every snapshot/engine path, and — the point — let
column pruning reach the Parquet scan through a live MOR LWW fold."""

from __future__ import annotations

import re

import pytest

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA

KEYS = ["conv_id", "turn_idx"]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path, **kw):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=2, write_mode=kw.pop("write_mode", "mor"), **kw,
    )
    # updates + a delete across batches so the live fold is exercised
    t.merge(_ev(spark, [
        ("a", 0, "user", "v1", None, 1, "I"),
        ("b", 0, "user", "stay", None, 2, "I"),
        ("c", 0, "tool", "doomed", None, 3, "I"),
    ]), batch_id=0)
    t.merge(_ev(spark, [
        ("a", 0, "assistant", "v2", None, 10, "U"),
        ("c", 0, None, None, None, 11, "D"),
    ]), batch_id=1)
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("write_mode", ["mor", "cow"])
def test_projected_equals_full_projection(spark, tmp_path, write_mode):
    t = _table(spark, tmp_path, write_mode=write_mode)
    full = t.read().select("conv_id", "text")
    proj = t.read(columns=["conv_id", "text"])
    assert proj.columns == ["conv_id", "text"]
    assert _rows(proj) == _rows(full)
    # historical snapshot too
    old = t.read(version=2, columns=["conv_id", "role"])
    assert _rows(old) == _rows(t.read(version=2).select("conv_id", "role"))


def test_projection_prunes_the_scan_through_the_live_fold(spark, tmp_path):
    t = _table(spark, tmp_path)  # two delta dirs -> fold cannot skip
    plan = (
        t.read(columns=["conv_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
    assert schemas, plan
    for s in schemas:
        assert "text" not in s and "role" not in s, s
    # the unprojected read really does carry every column (the contrast
    # that makes the assertion above meaningful)
    plan_full = (
        t.read()._jdf.queryExecution().executedPlan().toString()
    )
    assert any(
        "text" in s for s in re.findall(r"ReadSchema: ([^\n]+)", plan_full)
    )


def test_projected_read_validates_columns(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="not in the table schema"):
        t.read(columns=["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        t.read(columns=[])


def test_key_only_projection_still_resolves_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path)
    got = _rows(t.read(columns=["conv_id"]))
    assert got == [("a",), ("b",)]  # c's tombstone wins even unprojected


def test_partial_engine_projects_after_its_full_fold(spark, tmp_path):
    t = MiniLakeTable.create(
        spark, str(tmp_path / "p"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=2, write_mode="mor", merge_engine="partial",
    )
    t.merge(_ev(spark, [("a", 0, "user", "t1", None, 1, "I")]), batch_id=0)
    t.merge(_ev(spark, [("a", 0, None, "t2", None, 2, "U")]), batch_id=1)
    proj = t.read(columns=["conv_id", "role", "text"])
    # partial fold coalesces per column: role survives from lsn 1
    assert _rows(proj) == [("a", "user", "t2")]
