"""Dead-letter requeue: quarantine → repair → replay → re-verify.

`pipeline.requeue_dead_letters` closes the failure-isolation loop the
reference leaves open at skip-and-log
(/root/reference/utils/extract.py:120-188): DLQ rows are repaired and
re-ingested through the same validate → clean → MERGE pipeline,
exactly-once under a dedicated stream lineage; still-unrepairable rows
re-quarantine; consumed files archive so requeues don't re-read them.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.pipeline import (
    ApplyConfig,
    apply_batch,
    requeue_dead_letters,
)
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _table(spark, tmp_path, name="t"):
    return MiniLakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS, n_buckets=4, write_mode="mor",
    )


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _dirty(spark, tmp_path):
    """A table fed one batch with 2 valid, 2 repairable (op='X') and
    1 unrepairable (null conv_id) rows."""
    t = _table(spark, tmp_path)
    apply_batch(
        t,
        _src(spark, [
            ("a", 0, "user", "ok-1", None, 1, "I"),
            ("b", 0, "user", "ok-2", None, 2, "I"),
            ("a", 0, "user", "fix-me", None, 3, "X"),     # unknown op
            ("b", 0, "user", "fix-me-too", None, 4, "X"),  # unknown op
            (None, 0, "user", "hopeless", None, 5, "U"),   # lost key
        ]),
        batch_id=0,
    )
    return t


def _repair_x(dlq):
    return dlq.select(
        "conv_id", "turn_idx", "role", "text", "ts",
        F.col("_lsn").alias("lsn"),
        F.when(F.col("_src_op") == "X", F.lit("U"))
        .otherwise(F.col("_src_op"))
        .alias("op"),
    )


def _state(t):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }


def test_requeue_repairs_and_requarantines(spark, tmp_path):
    t = _dirty(spark, tmp_path)
    assert _state(t) == {("a", 0): "ok-1", ("b", 0): "ok-2"}
    dl = os.path.join(t.root, "_deadletter")
    res = requeue_dead_letters(spark, t, repair=_repair_x, batch_id=0)
    assert not res.skipped
    # repaired rows applied (higher lsn wins LWW)
    assert _state(t) == {("a", 0): "fix-me", ("b", 0): "fix-me-too"}
    # the unrepairable row re-quarantined, not dropped
    redlq = spark.read.option("recursiveFileLookup", "true").parquet(dl)
    rows = redlq.collect()
    assert len(rows) == 1 and rows[0]["text"] == "hopeless"
    # consumed originals archived
    arch = os.path.join(t.root, "_deadletter_archive", "dlq-requeue-000000")
    archived = spark.read.option("recursiveFileLookup", "true").parquet(arch)
    assert archived.count() == 3


def test_requeue_is_fenced_and_fence_skips_archive(spark, tmp_path):
    t = _dirty(spark, tmp_path)
    requeue_dead_letters(spark, t, repair=_repair_x, batch_id=0)
    dl = os.path.join(t.root, "_deadletter")
    before = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(dl) for f in fs
    )
    res = requeue_dead_letters(spark, t, repair=_repair_x, batch_id=0)
    assert res.skipped and res.reason == "fenced"
    after = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(dl) for f in fs
    )
    assert before == after  # fenced re-run never archives
    # a LATER requeue of the re-quarantined rows is idempotent: the
    # hopeless row fails validation again, state unchanged
    res2 = requeue_dead_letters(spark, t, repair=_repair_x, batch_id=1)
    assert not res2.skipped
    assert _state(t) == {("a", 0): "fix-me", ("b", 0): "fix-me-too"}


def test_requeue_empty_tree_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    apply_batch(
        t, _src(spark, [("a", 0, "user", "clean", None, 1, "I")]), batch_id=0
    )
    v = t.current_version()
    res = requeue_dead_letters(spark, t, batch_id=0)
    assert res.skipped and res.reason == "empty"
    assert t.current_version() == v


def test_default_repair_retries_as_is(spark, tmp_path):
    # a row dead-lettered only because the column hadn't evolved yet:
    # after add_columns, the as-is retry... still fails validation if the
    # op was bad — so use a row with VALID op but null key? That's
    # unrepairable. The honest as-is case: op was valid all along but a
    # key column arrived null-CAST (junk type) — _raw keeps the junk,
    # typed col is null, retry stays dead. So assert the as-is retry
    # never drops rows: everything unrepairable re-quarantines.
    t = _dirty(spark, tmp_path)
    res = requeue_dead_letters(spark, t, batch_id=0)  # no repair fn
    assert not res.skipped
    # nothing was repairable as-is: state unchanged, all 3 re-quarantined
    assert _state(t) == {("a", 0): "ok-1", ("b", 0): "ok-2"}
    dl = os.path.join(t.root, "_deadletter")
    redlq = spark.read.option("recursiveFileLookup", "true").parquet(dl)
    assert redlq.count() == 3
