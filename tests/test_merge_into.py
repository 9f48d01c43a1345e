"""Generic conditional MERGE INTO + replaceWhere overwrite.

`lake.merge_into.merge_into` compiles Delta's MERGE builder clause set
(matched update/delete with conditions over s.*/t.*, not-matched insert,
not-matched-by-source update/delete) into ONE fenced LWW merge batch;
`overwrite_where` is replaceWhere — deletes for vacated keys plus the
replacement upserts in a single atomic snapshot. Both inherit every
lake guarantee (CDC-out visibility, constraints, fencing, lineage)
because they ARE merge batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.lake.merge_into import merge_into, overwrite_where
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]
EV = (
    "conv_id string, turn_idx int, role string, text string, "
    "ts timestamp, lsn long, op string"
)
SRC = "conv_id string, turn_idx int, role string, text string, ts timestamp"


def _seeded(spark, tmp_path, name="t", **kw):
    t = MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=4,
        write_mode="mor",
        **kw,
    )
    t.merge(
        spark.createDataFrame(
            [
                ("a", 0, "user", "hello", None, 10, "I"),
                ("a", 1, "assistant", "hi there", None, 11, "I"),
                ("b", 0, "user", "spam spam", None, 12, "I"),
                ("c", 0, "tool", "stale", None, 13, "I"),
            ],
            EV,
        ),
        batch_id=0,
    )
    return t


def _state(t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in t.read().collect()
    }


def test_upsert_star_parity_with_plain_merge(spark, tmp_path):
    """update_set='*' + insert_values='*' is the classic upsert — must
    equal applying the same rows as a plain LWW change batch."""
    t1 = _seeded(spark, tmp_path, "m")
    t2 = _seeded(spark, tmp_path, "plain")
    rows = [
        ("a", 0, "user", "rewritten", None),  # matched -> update
        ("z", 9, "system", "brand new", None),  # not matched -> insert
    ]
    src = spark.createDataFrame(rows, SRC)
    res = merge_into(t1, src, update_set="*", insert_values="*")
    assert not res.skipped and res.rows_upserted == 2
    t2.merge(
        spark.createDataFrame(
            [r + (100, "U") for r in rows], EV
        ),
        batch_id=1,
    )
    assert _state(t1) == _state(t2)


def test_conditional_update_references_both_sides(spark, tmp_path):
    """The CDC guard: update only when the source is newer — a clause
    over s.* AND t.*; rows failing it stay untouched."""
    t = _seeded(spark, tmp_path)
    src = spark.createDataFrame(
        [
            ("a", 0, "user", "newer", None),
            ("a", 1, "assistant", "should not apply", None),
        ],
        SRC,
    )
    merge_into(
        t,
        src,
        update_set={"text": "concat(s.text, ':', t.role)"},
        update_condition="s.text <> 'should not apply'",
    )
    st = _state(t)
    assert st[("a", 0)] == ("user", "newer:user")  # role kept from target
    assert st[("a", 1)] == ("assistant", "hi there")  # untouched


def test_matched_delete_beats_update(spark, tmp_path):
    """Clause precedence: a row satisfying both conditions deletes."""
    t = _seeded(spark, tmp_path)
    src = spark.createDataFrame(
        [("b", 0, "user", "x", None), ("a", 0, "user", "y", None)], SRC
    )
    merge_into(
        t,
        src,
        update_set="*",
        delete_condition="t.text LIKE '%spam%'",
    )
    st = _state(t)
    assert ("b", 0) not in st
    assert st[("a", 0)] == ("user", "y")


def test_insert_condition_and_write_defaults(spark, tmp_path):
    """Unassigned insert columns get the declared write-default, else
    null; the insert condition filters source rows."""
    t = _seeded(spark, tmp_path, "defaults")
    from pyspark.sql import types as T

    t.add_columns(
        [T.StructField("grade", T.StringType())],
        write_defaults={"grade": "ungraded"},
    )
    src = spark.createDataFrame(
        [
            ("n", 1, "user", "keep me", None),
            ("n", 2, "user", "drop me", None),
        ],
        SRC,
    )
    merge_into(
        t,
        src,
        insert_values={"text": "upper(s.text)"},
        insert_condition="s.text NOT LIKE 'drop%'",
    )
    rows = {r["turn_idx"]: r for r in t.read().filter("conv_id = 'n'").collect()}
    assert list(rows) == [1]
    assert rows[1]["text"] == "KEEP ME"
    assert rows[1]["role"] is None  # unassigned, no default declared
    assert rows[1]["grade"] == "ungraded"  # declared write-default


def test_by_source_delete_and_update(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE: live keys absent from the source are
    deleted / updated per their conditions (the sync-to-snapshot use)."""
    t = _seeded(spark, tmp_path)
    src = spark.createDataFrame([("a", 0, "user", "touched", None)], SRC)
    merge_into(
        t,
        src,
        update_set="*",
        by_source_delete_condition="t.role = 'tool'",
        by_source_update_set={"text": "concat('stale:', t.text)"},
        by_source_update_condition="t.role = 'assistant'",
    )
    st = _state(t)
    assert st[("a", 0)] == ("user", "touched")
    assert ("c", 0) not in st  # tool row absent from source -> deleted
    assert st[("a", 1)] == ("assistant", "stale:hi there")
    assert st[("b", 0)] == ("user", "spam spam")  # untouched


def test_point_and_scan_strategies_agree(spark, tmp_path):
    ta = _seeded(spark, tmp_path, "pt")
    tb = _seeded(spark, tmp_path, "sc")
    src = spark.createDataFrame(
        [("a", 0, "user", "via", None), ("q", 5, "user", "new", None)], SRC
    )
    kw = dict(
        update_set={"text": "concat(s.text, '-', t.text)"},
        insert_values="*",
    )
    merge_into(ta, src, strategy="point", **kw)
    merge_into(tb, src, strategy="scan", **kw)
    assert _state(ta) == _state(tb)
    assert _state(ta)[("a", 0)] == ("user", "via-hello")


def test_merge_into_is_one_atomic_cdc_visible_commit(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v = t.current_version()
    merge_into(
        t,
        spark.createDataFrame([("a", 0, "user", "u1", None)], SRC),
        update_set="*",
        by_source_delete_condition="t.role = 'tool'",
    )
    assert t.current_version() == v + 1  # ONE commit for all clauses
    ch = t.read_changes_since(v).collect()
    got = {(r["conv_id"], r["turn_idx"]): r["_deleted"] for r in ch}
    assert got == {("a", 0): False, ("c", 0): True}


def test_later_stream_event_beats_the_command(spark, tmp_path):
    """The delete_where convention: the CDC stream stays the source of
    truth — a tail event with a higher lsn wins over the command."""
    t = _seeded(spark, tmp_path)
    merge_into(
        t,
        spark.createDataFrame([("b", 0, None, None, None)], SRC),
        delete_condition="true",
    )
    assert ("b", 0) not in _state(t)
    t.merge(
        spark.createDataFrame([("b", 0, "user", "reborn", None, 10_000, "I")], EV),
        batch_id=77,
    )
    assert _state(t)[("b", 0)] == ("user", "reborn")


def test_validation_errors(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    src = spark.createDataFrame([("a", 0, "user", "x", None)], SRC)
    with pytest.raises(ValueError, match="no clauses"):
        merge_into(t, src)
    with pytest.raises(ValueError, match="key column"):
        merge_into(t, src, update_set={"conv_id": "'nope'"})
    with pytest.raises(ValueError, match="no column"):
        merge_into(t, src, update_set={"bogus": "1"})
    with pytest.raises(ValueError, match="lacks key column"):
        merge_into(t, src.drop("turn_idx"), update_set="*")
    with pytest.raises(ValueError, match="multiple rows per key"):
        merge_into(t, src.unionAll(src), update_set="*")
    with pytest.raises(ValueError, match="null key"):
        merge_into(
            t,
            spark.createDataFrame([(None, 0, "u", "x", None)], SRC),
            update_set="*",
        )
    with pytest.raises(ValueError, match="by_source_update_condition"):
        merge_into(t, src, by_source_update_set={"text": "t.text"})
    agg = MiniLakeTable.create(
        spark,
        str(tmp_path / "agg"),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=2,
        write_mode="mor",
        merge_engine="partial",
    )
    with pytest.raises(ValueError, match="lww merge engine"):
        merge_into(agg, src, update_set="*")


def test_overwrite_where_atomic_replace(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v = t.current_version()
    repl = spark.createDataFrame(
        [
            ("a", 0, "user", "ow-a0", None),  # replaces in-region key
            ("r", 7, "user", "ow-new", None),  # new key inside region
        ],
        SRC,
    )
    res = overwrite_where(t, "role = 'user'", repl)
    assert not res.skipped
    assert t.current_version() == v + 1  # deletes + upserts: ONE commit
    st = _state(t)
    # region keys not re-supplied are gone; non-region rows untouched
    assert st == {
        ("a", 0): ("user", "ow-a0"),
        ("r", 7): ("user", "ow-new"),
        ("a", 1): ("assistant", "hi there"),
        ("c", 0): ("tool", "stale"),
    }


def test_overwrite_where_rejects_out_of_region_rows(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    bad = spark.createDataFrame([("x", 0, "tool", "not-user", None)], SRC)
    with pytest.raises(ValueError, match="violate the replaceWhere"):
        overwrite_where(t, "role = 'user'", bad)
    # validate=False writes it anyway (documented override)
    overwrite_where(t, "role = 'user'", bad, validate=False)
    assert _state(t)[("x", 0)] == ("tool", "not-user")


def test_merge_into_plan_is_equi_join_and_point_prunes(spark, tmp_path):
    """100 TB contract: the clause evaluation is a shuffled/broadcast
    EQUI join (never nested-loop/cartesian), and the point strategy
    feeds it a bucket-pruned target read, not a full scan."""
    from etl_pipeline_spark.plans.inspect import explain_str

    t = _seeded(spark, tmp_path, "plan")
    src = spark.createDataFrame([("a", 0, "user", "x", None)], SRC)
    captured = {}
    orig = t.merge

    def spy(events, **kw):
        captured["plan"] = explain_str(events)
        return orig(events, **kw)

    t.merge = spy
    merge_into(t, src, update_set="*", strategy="scan")
    assert "CartesianProduct" not in captured["plan"]
    assert "BroadcastNestedLoopJoin" not in captured["plan"]

    # point strategy: only the probed key's bucket dirs reach the scan
    n_dirs_all = sum(len(v) for v in t.manifest()["buckets"].values())
    seen = {}
    orig_rfk = t.read_for_keys

    def rfk_spy(values, version=None):
        seen["values"] = list(values)
        return orig_rfk(values, version)

    t.read_for_keys = rfk_spy
    merge_into(t, src, update_set="*", strategy="point")
    assert seen["values"] == ["a"]
    assert n_dirs_all >= 1
