"""Initial-default column values (Iceberg v3 default-values analog).

A column added with ``add_columns(..., defaults={...})`` reads the
default for every row written BEFORE the add, and exactly what the
writer wrote — explicit nulls included — for every row written after.
The engine tells the two apart per data FILE (merge fills
source-omitted columns with typed nulls, so every post-add file
physically contains the column; pre-add files lack it — one memoized
Parquet footer per dir). No file is rewritten by the add; compaction
materializes the default into its output as a side effect of reading
through `_read_files`.

Reference contrast: the reference's declared-schema cast
(/root/reference/utils/transform.py:139-201) has no evolution story at
all — a new column means editing the schema constant and re-running;
defaults are what make additive evolution deployable mid-stream at
10^10 events (backfill-by-rewrite is not an option).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _src(spark, rows, cols="text string"):
    return spark.createDataFrame(
        rows,
        f"conv_id string, turn_idx int, role string, {cols}, "
        "ts timestamp, lsn long, op string",
    )


def _seeded(spark, tmp_path, name="t", write_mode="mor", engine="lww"):
    t = MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=4,
        write_mode=write_mode,
        merge_engine=engine,
    )
    t.merge(
        _src(spark, [
            ("a", 0, "user", "hello", None, 1, "I"),
            ("b", 0, "user", "hi", None, 2, "I"),
        ]),
        batch_id=0,
    )
    return t


def test_default_splits_pre_add_from_post_add(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    files_before = sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    )
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        defaults={"tool": "none"},
    )
    # the add rewrites no data files
    assert sorted(
        d for ds in t.manifest()["buckets"].values() for d in ds
    ) == files_before
    # post-add: one row with a real value, one with an EXPLICIT null,
    # plus a brand-new key whose source omits the column entirely
    t.merge(
        _src(spark, [
            ("a", 0, "user", "hello", "search", None, 10, "U"),
            ("b", 0, "user", "hi", None, None, 11, "U"),
        ], "text string, tool string"),
        batch_id=1,
    )
    t.merge(
        _src(spark, [("c", 0, "user", "yo", None, 12, "I")]),
        batch_id=2,
    )
    got = {r["conv_id"]: r["tool"] for r in t.read().collect()}
    # a: written value; b: explicit null stays null (file has the
    # column); c: merge filled the omitted column with a typed null in a
    # post-add file — the writer's null, not the default
    assert got == {"a": "search", "b": None, "c": None}


def test_default_surfaces_for_pre_add_winners_and_time_travel(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v_pre = t.current_version()
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        defaults={"tool": "none"},
    )
    # both keys' LWW winners are pre-add rows → default surfaces
    got = {r["conv_id"]: r["tool"] for r in t.read().collect()}
    assert got == {"a": "none", "b": "none"}
    # time travel to the pre-add snapshot: column absent entirely
    assert "tool" not in t.read(version=v_pre).columns


def test_default_survives_rename_and_compaction_materializes(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        defaults={"tool": "none"},
    )
    t.rename_column("tool", "tool_name")
    got = {r["conv_id"]: r["tool_name"] for r in t.read().collect()}
    assert got == {"a": "none", "b": "none"}
    # compaction reads through the choke point → output files contain
    # the materialized default; a fresh handle (cold footer memo) must
    # read the same state
    t.compact()
    t2 = MiniLakeTable(spark, t.root)
    got = {r["conv_id"]: r["tool_name"] for r in t2.read().collect()}
    assert got == {"a": "none", "b": "none"}
    # post-compaction files physically contain the column now
    d = next(
        d for ds in t2.manifest()["buckets"].values() for d in ds
    )
    assert any("tool" in c for c in t2._dir_physical_cols(d))


def test_default_rows_lose_lww_to_later_writes(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        defaults={"tool": "none"},
    )
    t.merge(
        _src(spark, [
            ("a", 0, "assistant", "hello v2", "browse", None, 20, "U"),
        ], "text string, tool string"),
        batch_id=1,
    )
    got = {r["conv_id"]: (r["text"], r["tool"]) for r in t.read().collect()}
    assert got == {"a": ("hello v2", "browse"), "b": ("hi", "none")}
    # and CDC-out over the post-add window carries the written value
    ch = t.read_changes_since(2).filter(F.col("conv_id") == "a").collect()
    assert [r["tool"] for r in ch] == ["browse"]


def test_default_validation(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    with pytest.raises(ValueError, match="null initial-default"):
        t.add_columns(
            [T.StructField("tool", T.StringType(), True)],
            defaults={"tool": None},
        )
    with pytest.raises(ValueError, match="not being added"):
        t.add_columns(
            [T.StructField("tool", T.StringType(), True)],
            defaults={"other": "x"},
        )
    with pytest.raises(ValueError, match="JSON scalar"):
        t.add_columns(
            [T.StructField("tool", T.StringType(), True)],
            defaults={"tool": ["a"]},
        )
    p = _seeded(spark, tmp_path, name="p", engine="partial")
    with pytest.raises(ValueError, match="merge_engine='lww'"):
        p.add_columns(
            [T.StructField("tool", T.StringType(), True)],
            defaults={"tool": "none"},
        )


def test_write_default_fills_only_writer_omitted_columns(spark, tmp_path):
    """Iceberg v3 write-defaults: a source that OMITS the column gets
    the write-default; an explicit null stays null; pre-add rows read
    the initial-default — the two defaults are independent values."""
    t = _seeded(spark, tmp_path, name="wd")
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        defaults={"tool": "pre-add"},
        write_defaults={"tool": "omitted"},
    )
    # writer omits the column entirely → write-default
    t.merge(
        _src(spark, [("c", 0, "user", "yo", None, 10, "I")]),
        batch_id=1,
    )
    # writer sends an explicit null → null
    t.merge(
        _src(spark, [
            ("d", 0, "user", "hey", None, None, 11, "I"),
        ], "text string, tool string"),
        batch_id=2,
    )
    got = {r["conv_id"]: r["tool"] for r in t.read().collect()}
    assert got == {
        "a": "pre-add",   # pre-add file → initial-default
        "b": "pre-add",
        "c": "omitted",   # writer omitted → write-default
        "d": None,        # explicit null → null
    }


def test_write_default_through_pipeline_apply_batch(spark, tmp_path):
    from etl_pipeline_spark.pipeline import ApplyConfig, apply_batch

    t = _seeded(spark, tmp_path, name="wdp")
    t.add_columns(
        [T.StructField("tool", T.StringType(), True)],
        write_defaults={"tool": "omitted"},
    )
    apply_batch(
        t,
        _src(spark, [("c", 0, "user", "yo", None, 10, "I")]),
        batch_id=1,
        cfg=ApplyConfig(),
    )
    got = {r["conv_id"]: r["tool"] for r in t.read().collect()}
    assert got["c"] == "omitted"
    assert got["a"] is None and got["b"] is None  # no initial-default here


def test_write_default_rejected_on_partial_engine(spark, tmp_path):
    p = _seeded(spark, tmp_path, name="wdpart", engine="partial")
    with pytest.raises(ValueError, match="merge_engine='lww'"):
        p.add_columns(
            [T.StructField("tool", T.StringType(), True)],
            write_defaults={"tool": "omitted"},
        )
