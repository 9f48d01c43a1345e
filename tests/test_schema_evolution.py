"""Full column-level schema evolution: rename + drop, metadata-only.

Iceberg's field-id discipline on the MiniLake backend, kept in
StructField metadata as a ``physical`` on-disk name: rename changes only
the logical name (files — past and future — keep the original column;
readers alias), drop stops projecting the column and RETIRES its
physical name, and a re-add of a dropped name maps to a fresh physical
column so old values can never resurrect. Time travel reads every
version under that version's own names. The additive half
(add_columns) is covered in tests/test_minilake.py; the reference has
a fixed declared schema (/root/reference/utils/transform.py:139-201) —
this is the evolution story that schema outgrowing needs at 10^10
events, where rewriting data for a rename is not an option.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _table(spark, tmp_path, write_mode="mor", name="t"):
    return MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=4,
        write_mode=write_mode,
    )


def _src(spark, rows, text_col="text"):
    return spark.createDataFrame(
        rows,
        f"conv_id string, turn_idx int, role string, {text_col} string, "
        "ts timestamp, lsn long, op string",
    )


def _seeded(spark, tmp_path, **kwargs):
    t = _table(spark, tmp_path, **kwargs)
    t.merge(
        _src(spark, [
            ("a", 0, "user", "hello", None, 1, "I"),
            ("b", 0, "user", "hi", None, 2, "I"),
        ]),
        batch_id=0,
    )
    return t


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    files_before = sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    )
    v_pre = t.current_version()
    t.rename_column("text", "body")
    # no data rewrite: the committed file set is byte-identical
    assert sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    ) == files_before
    got = {r["conv_id"]: r["body"] for r in t.read().collect()}
    assert got == {"a": "hello", "b": "hi"}
    assert "text" not in t.read().columns
    # time travel reads the pre-rename snapshot under the OLD name
    old = t.read(version=v_pre)
    assert "text" in old.columns and "body" not in old.columns
    # post-rename merges speak the new name; LWW across the rename holds
    t.merge(
        _src(spark, [("a", 0, "user", "hello v2", None, 10, "U")], "body"),
        batch_id=1,
    )
    got = {r["conv_id"]: r["body"] for r in t.read().collect()}
    assert got == {"a": "hello v2", "b": "hi"}
    # new files still carry the ORIGINAL physical column name
    newest = sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    )
    new_dirs = [d for d in newest if d not in files_before]
    assert new_dirs
    import glob as _glob
    import os as _os

    pf = _glob.glob(_os.path.join(new_dirs[0], "*.parquet"))[0]
    cols = pq.read_schema(pf).names
    assert "text" in cols and "body" not in cols


def test_rename_key_column_keeps_layout_and_fences(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.rename_column("conv_id", "conversation_id")
    assert t.manifest()["key_cols"] == ["conversation_id", "turn_idx"]
    # fences survive: re-delivering batch 0 is a no-op
    redo = t.merge(
        _src(spark, [("a", 0, "user", "ZOMBIE", None, 99, "U")])
        .withColumnRenamed("conv_id", "conversation_id"),
        batch_id=0,
    )
    assert redo.skipped and redo.reason == "fenced"
    # merges keyed on the new name LWW-match rows written under the old
    t.merge(
        _src(spark, [("a", 0, "user", "renamed-key", None, 10, "U")])
        .withColumnRenamed("conv_id", "conversation_id"),
        batch_id=1,
    )
    got = {r["conversation_id"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "renamed-key", "b": "hi"}
    # point lookups prune on the renamed key
    rows = t.read_for_keys(["a"]).collect()
    assert {r["conversation_id"] for r in rows} == {"a"}
    # compaction rewrites under the ORIGINAL physical name + sorts on it
    t.compact()
    got = {r["conversation_id"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "renamed-key", "b": "hi"}


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v_pre = t.current_version()
    t.drop_column("role")
    assert "role" not in t.read().columns
    # time travel still shows the dropped column
    assert {r["role"] for r in t.read(version=v_pre).collect()} == {"user"}
    # re-add the same logical name: a FRESH physical column — the old
    # files' 'user' values must NOT come back, even after compaction
    t.add_columns([T.StructField("role", T.StringType(), True)])
    assert [
        r["role"] for r in t.read().collect()
    ] == [None, None]
    t.compact()
    assert [r["role"] for r in t.read().collect()] == [None, None]
    # and new writes to the re-added column land + survive compaction
    t.merge(
        _src(spark, [("a", 0, "assistant", "hello v2", None, 10, "U")]),
        batch_id=1,
    )
    got = {r["conv_id"]: (r["role"], r["text"]) for r in t.read().collect()}
    assert got == {"a": ("assistant", "hello v2"), "b": (None, "hi")}
    t.compact()
    assert {
        r["conv_id"]: (r["role"], r["text"]) for r in t.read().collect()
    } == got


def test_rename_frees_name_without_resurrection(spark, tmp_path):
    # rename text -> body, then ADD a new 'text': the new column must
    # not read the old physical 'text' values
    t = _seeded(spark, tmp_path)
    t.rename_column("text", "body")
    t.add_columns([T.StructField("text", T.StringType(), True)])
    rows = {r["conv_id"]: (r["body"], r["text"]) for r in t.read().collect()}
    assert rows == {"a": ("hello", None), "b": ("hi", None)}


def test_evolution_validations(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("text", "role")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("text", "_sneaky")
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("conv_id")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")


def test_requeue_speaks_logical_names_after_rename(spark, tmp_path):
    """Fused DLQ files written post-rename carry the PHYSICAL column
    name; requeue must alias back to logical so repair fns and the
    re-ingest see the same schema every other surface speaks."""
    from etl_pipeline_spark.pipeline import apply_batch, requeue_dead_letters

    t = _seeded(spark, tmp_path)
    t.rename_column("text", "body")
    apply_batch(
        t,
        _src(spark, [("c", 0, "user", "stuck", None, 30, "X")], "body"),
        batch_id=1,
    )
    assert "c" not in {r["conv_id"] for r in t.read().collect()}

    def repair(dlq):
        assert "body" in dlq.columns and "text" not in dlq.columns
        return dlq.select(
            "conv_id", "turn_idx", "role", "body", "ts",
            F.col("_lsn").alias("lsn"),
            F.when(F.col("_src_op") == "X", F.lit("U"))
            .otherwise(F.col("_src_op"))
            .alias("op"),
        )

    res = requeue_dead_letters(spark, t, repair=repair, batch_id=0)
    assert not res.skipped
    got = {r["conv_id"]: r["body"] for r in t.read().collect()}
    assert got == {"a": "hello", "b": "hi", "c": "stuck"}


def test_rename_survives_maintenance_and_cdc_out(spark, tmp_path):
    """The whole lifecycle under a renamed schema: merge → rename →
    merge → compact → incremental changes → retention GC."""
    t = _seeded(spark, tmp_path)
    v_pre = t.current_version()
    t.rename_column("text", "body")
    t.merge(
        _src(spark, [
            ("c", 0, "user", "post-rename", None, 20, "I"),
            ("a", 0, None, None, None, 21, "D"),
        ], "body"),
        batch_id=1,
    )
    t.compact()
    # CDC-out speaks the logical (renamed) schema
    changes = t.read_changes_since(v_pre)
    assert "body" in changes.columns and "text" not in changes.columns
    assert changes.filter(F.col("body") == "post-rename").count() == 1
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    got = {r["conv_id"]: r["body"] for r in t.read().collect()}
    assert got == {"b": "hi", "c": "post-rename"}
