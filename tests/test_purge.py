"""Right-to-be-forgotten purge (minilake.purge_where): the claims — no
physical row matching the predicate survives in ANY readable version
(including LWW-superseded old payloads and tombstone-retained ones,
which a plain DELETE never touches), unaffected buckets keep their
files byte-identical, pinned refs refuse the purge up front, and a CDC
consumer behind the purge horizon gets the standard re-seed error
instead of silently missing the rewrite. Composition target the
delete_where docstring promises: DELETE + compact(drop_tombstones) +
expire_snapshots, verified."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _table(spark, tmp_path, **kw):
    kw.setdefault("write_mode", "mor")
    return MiniLakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4, **kw,
    )


def _b(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


def _all_physical_texts(t):
    import glob as g
    import os
    texts = []
    for p in sorted(
        g.glob(os.path.join(t.meta_dir, "v*.json"))
    ):
        v = int(os.path.basename(p)[1:-5])
        texts += [
            r["text"]
            for r in t.read_physical(version=v).select("text").collect()
            if r["text"] is not None
        ]
    return texts


def test_purge_erases_live_keys_everywhere(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_b(spark, [("evil", 0, "secret-a", 1, "I"),
                       ("ok", 0, "fine", 2, "I")]), batch_id=0)
    t.merge(_b(spark, [("evil", 1, "secret-b", 3, "I"),
                       ("ok", 1, "fine2", 4, "I")]), batch_id=1)
    rep = t.purge_where("conv_id = 'evil'", orphan_min_age_s=0)
    assert rep["verified"] and rep["rows_deleted"] == 2
    assert rep["buckets_rewritten"] >= 1 and rep["versions_expired"] >= 1
    state = t.read()
    assert state.filter(F.col("conv_id") == "evil").count() == 0
    assert state.count() == 2
    # not even a tombstone names the purged key
    assert t.read_tombstones().count() == 0
    assert not any("secret" in x for x in _all_physical_texts(t))


def test_purge_reaches_lww_superseded_payloads(spark, tmp_path):
    """The case DELETE cannot express: the key's CURRENT text is clean,
    but an old physical delta row still carries the secret. The purge
    must rewrite that file while keeping the current row alive."""
    t = _table(spark, tmp_path)
    t.merge(_b(spark, [("c1", 0, "the secret phrase", 1, "I")]), batch_id=0)
    t.merge(_b(spark, [("c1", 0, "redacted", 2, "U")]), batch_id=1)
    assert any("secret" in x for x in _all_physical_texts(t))
    rep = t.purge_where("text LIKE '%secret%'", orphan_min_age_s=0)
    assert rep["verified"]
    # live row survives — its current image never matched
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "redacted"
    assert not any("secret" in x for x in _all_physical_texts(t))


def test_purge_erases_tombstone_payloads_and_history(spark, tmp_path):
    """A deleted key's tombstone (and pre-delete snapshots) still hold
    the payload physically; purging by key must leave no trace and no
    time travel back to it."""
    t = _table(spark, tmp_path)
    t.merge(_b(spark, [("gone", 0, "leak", 1, "I")]), batch_id=0)
    t.merge(_b(spark, [("gone", 0, None, 2, "D")]), batch_id=1)
    assert t.read_tombstones().count() == 1
    pre_purge_version = t.current_version()
    rep = t.purge_where("conv_id = 'gone'", orphan_min_age_s=0)
    assert rep["verified"]
    assert _all_physical_texts(t) == []
    with pytest.raises((ValueError, FileNotFoundError)):
        t.read(version=pre_purge_version).count()


def test_purge_refused_while_pinned(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_b(spark, [("c1", 0, "x", 1, "I")]), batch_id=0)
    t.create_tag("keep")
    with pytest.raises(ValueError, match="pinned.*tags"):
        t.purge_where("conv_id = 'c1'")
    t.delete_tag("keep")
    t.create_branch("wip")
    with pytest.raises(ValueError, match="pinned"):
        t.purge_where("conv_id = 'c1'")
    t.delete_branch("wip")
    t.merge(_b(spark, [("c2", 0, "y", 2, "I")]), batch_id=1,
            stage_to="audit1")
    with pytest.raises(ValueError, match="pinned"):
        t.purge_where("conv_id = 'c1'")
    t.abort_staged("audit1")
    assert t.purge_where("conv_id = 'c1'", orphan_min_age_s=0)["verified"]


def test_purge_leaves_unaffected_buckets_untouched(spark, tmp_path):
    t = _table(spark, tmp_path)
    rows = [(f"c{i}", 0, f"t{i}", i + 1, "I") for i in range(12)]
    t.merge(_b(spark, rows), batch_id=0)
    t.compact()  # one clean file set per bucket
    m0 = t.manifest()
    target = "c3"
    bexpr = t._bucket_expr("conv_id", m0["n_buckets"])
    tb = (
        spark.createDataFrame([(target,)], "conv_id string")
        .select(bexpr.alias("b")).first()["b"]
    )
    rep = t.purge_where(f"conv_id = '{target}'", orphan_min_age_s=0)
    assert rep["buckets_rewritten"] == 1
    m1 = t.manifest()
    for b, dirs in m0["buckets"].items():
        if int(b) != tb:
            assert m1["buckets"][b] == dirs  # byte-identical files kept
        else:
            assert m1["buckets"][b] != dirs
    assert t.read().count() == 11


def test_purge_noop_predicate_still_verifies(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_b(spark, [("c1", 0, "x", 1, "I")]), batch_id=0)
    rep = t.purge_where("conv_id = 'nobody'", orphan_min_age_s=0)
    assert rep["rows_deleted"] == 0 and rep["buckets_rewritten"] == 0
    assert rep["verified"]
    assert t.read().count() == 1


def test_cdc_consumer_behind_purge_horizon_gets_reseed_error(
    spark, tmp_path
):
    t = _table(spark, tmp_path)
    t.merge(_b(spark, [("c1", 0, "a", 1, "I")]), batch_id=0)
    watermark = t.current_version()
    t.merge(_b(spark, [("evil", 0, "s", 2, "I")]), batch_id=1)
    t.purge_where("conv_id = 'evil'", orphan_min_age_s=0)
    with pytest.raises(ValueError):
        t.read_changes_since(watermark).count()


def test_purge_on_cow_table(spark, tmp_path):
    t = _table(spark, tmp_path, write_mode="cow")
    t.merge(_b(spark, [("evil", 0, "secret", 1, "I"),
                       ("ok", 0, "fine", 2, "I")]), batch_id=0)
    t.merge(_b(spark, [("ok", 1, "fine2", 3, "I")]), batch_id=1)
    rep = t.purge_where("conv_id = 'evil'", orphan_min_age_s=0)
    assert rep["verified"]
    assert t.read().count() == 2
    assert not any("secret" in x for x in _all_physical_texts(t))


def test_purge_keeps_collateral_tombstones(spark, tmp_path):
    """A purge must drop ONLY the victims' tombstones: an unrelated
    deleted key sharing a bucket keeps its tombstone, so a replica's
    later snapshot re-seed can still overwrite/suppress that key (the
    documented purge-then-reseed procedure covers victims; collateral
    keys must not silently lose their delete markers)."""
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t1"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=1, write_mode="mor",
    )  # one bucket: victim and bystander share it
    t.merge(_b(spark, [
        ("victim", 0, "secret", 1, "I"),
        ("bystander", 0, "was-here", 2, "I"),
    ]), batch_id=0)
    # bystander deleted BEFORE the purge — its tombstone is unrelated
    t.merge(_b(spark, [("bystander", 0, None, 3, "D")]), batch_id=1)
    res = t.purge_where("text = 'secret'", orphan_min_age_s=0)
    assert res["verified"] is True
    # victim's existence erased: no physical row, no tombstone
    phys = t.read_physical()
    assert phys.filter("conv_id = 'victim'").count() == 0
    # bystander's tombstone SURVIVES the purge compaction
    tomb = phys.filter(
        (F.col("conv_id") == "bystander") & F.col("_deleted")
    )
    assert tomb.count() == 1
    # and the live view still shows neither key
    assert t.read().count() == 0
