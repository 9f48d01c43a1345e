"""Catalog layer (lake/catalog.MiniLakeCatalog): namespaced identifiers
over uuid physical roots. The claims: rename is ONE atomic pointer
commit (open readers keep working, manifest paths never rewritten),
concurrent registrations CAS-resolve with exactly one winner, drop
without purge is recoverable via register_table, and a torn catalog
commit is adopted by the same CURRENT-repair the table manifest uses."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from etl_pipeline_spark.lake.catalog import MiniLakeCatalog
from etl_pipeline_spark.lake.minilake import MiniLakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _seed(spark, t, n=5):
    t.merge(
        spark.createDataFrame(
            [(f"c{i}", i, f"v{i}", i + 1, "I") for i in range(n)],
            "conv_id string, turn_idx int, text string, lsn long, op string",
        ),
        batch_id=0,
    )


def test_create_load_list_namespaces(spark, tmp_path):
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    t1 = cat.create_table("prod.transcripts", SCHEMA,
                          key_cols=["conv_id", "turn_idx"], n_buckets=2,
                          write_mode="mor")
    cat.create_table("staging.transcripts", SCHEMA,
                     key_cols=["conv_id", "turn_idx"], n_buckets=2)
    cat.create_table("bare", SCHEMA, key_cols=["conv_id", "turn_idx"])
    _seed(spark, t1)
    assert cat.list_tables() == [
        "default.bare", "prod.transcripts", "staging.transcripts"
    ]
    assert cat.list_tables("prod") == ["prod.transcripts"]
    assert cat.list_namespaces() == ["default", "prod", "staging"]
    assert cat.load_table("prod.transcripts").read().count() == 5
    assert cat.table_exists("bare") and not cat.table_exists("ghost")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("bare", SCHEMA, key_cols=["conv_id", "turn_idx"])
    with pytest.raises(KeyError):
        cat.load_table("prod.ghost")
    with pytest.raises(ValueError, match="identifier"):
        cat.load_table("a.b.c")


def test_rename_is_atomic_pointer_only(spark, tmp_path):
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    t = cat.create_table("prod.conv", SCHEMA,
                         key_cols=["conv_id", "turn_idx"], n_buckets=2,
                         write_mode="mor")
    _seed(spark, t)
    root_before = t.root
    reader = cat.load_table("prod.conv")  # an OPEN handle
    cat.rename_table("prod.conv", "archive.conv_v1")
    # physical root untouched — the open reader keeps working
    assert cat.load_table("archive.conv_v1").root == root_before
    assert reader.read().count() == 5
    assert not cat.table_exists("prod.conv")
    # a rename can't steal an occupied identifier
    cat.create_table("prod.conv", SCHEMA, key_cols=["conv_id", "turn_idx"])
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_table("archive.conv_v1", "prod.conv")


def test_drop_without_purge_is_recoverable(spark, tmp_path):
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    t = cat.create_table("prod.conv", SCHEMA,
                         key_cols=["conv_id", "turn_idx"], n_buckets=2,
                         write_mode="mor")
    _seed(spark, t)
    root = t.root
    cat.drop_table("prod.conv")
    assert not cat.table_exists("prod.conv")
    assert MiniLakeTable.exists(root)  # data still there
    cat.register_table("prod.conv_restored", root)
    assert cat.load_table("prod.conv_restored").read().count() == 5
    cat.drop_table("prod.conv_restored", purge=True)
    assert not os.path.exists(root)
    with pytest.raises(ValueError, match="no MiniLake table"):
        cat.register_table("prod.ghost", root)


def test_concurrent_registration_one_winner(spark, tmp_path):
    """Pin the CAS: a racer registers the SAME identifier between this
    writer's state read and its commit — exactly one wins, the loser's
    pre-created physical root is cleaned up."""
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    racer = MiniLakeCatalog(spark, str(tmp_path / "lake"))
    orig = cat._write_state
    fired = {"n": 0}

    def hooked(state):
        if fired["n"] == 0:
            fired["n"] = 1
            racer.create_table("prod.conv", SCHEMA,
                               key_cols=["conv_id", "turn_idx"])
        return orig(state)

    cat._write_state = hooked
    try:
        with pytest.raises(ValueError, match="already exists"):
            cat.create_table("prod.conv", SCHEMA,
                             key_cols=["conv_id", "turn_idx"])
    finally:
        cat._write_state = orig
    # exactly one physical root is registered; the loser's is gone
    assert cat.list_tables() == ["prod.conv"]
    root = cat.state()["tables"]["prod.conv"]
    others = [
        d for d in os.listdir(cat.tables_dir)
        if os.path.join(cat.tables_dir, d) != root
    ]
    assert others == []


def test_torn_commit_is_adopted(spark, tmp_path):
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    cat.create_table("a.t", SCHEMA, key_cols=["conv_id", "turn_idx"])
    st = cat.state()
    # simulate a crash AFTER the v-file fsync, BEFORE the pointer
    # rename: write v{N+1} directly and leave CURRENT stale
    nxt = dict(st)
    nxt["version"] = st["version"] + 1
    nxt["tables"] = {**st["tables"]}
    nxt["tables"]["b.t2"] = nxt["tables"]["a.t"]
    with open(cat._state_path(nxt["version"]), "w") as f:
        json.dump(nxt, f)
    # next reader adopts the committed version
    assert "b.t2" in cat.state()["tables"]


def test_audit_all(spark, tmp_path):
    cat = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    t = cat.create_table("a.t", SCHEMA, key_cols=["conv_id", "turn_idx"],
                         n_buckets=2, write_mode="mor")
    _seed(spark, t)
    rep = cat.audit_all(level="metadata")
    assert rep["ok"] and set(rep["tables"]) == {"a.t"}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_property_catalog_matches_model(spark, tmp_path_factory, data):
    """Model-based: a random sequence of create/rename/drop/register
    operations must leave the catalog equal to a plain-dict model that
    applied the same sequence — including which operations FAILED (both
    sides must agree on every error)."""
    root = tmp_path_factory.mktemp("cat_prop")
    cat = MiniLakeCatalog.create(spark, str(root / "lake"))
    model: dict[str, str] = {}  # ident -> physical root
    names = [f"ns{i}.t{j}" for i in range(2) for j in range(3)]
    n_ops = data.draw(st.integers(3, 12))
    for _ in range(n_ops):
        op = data.draw(st.sampled_from(["create", "rename", "drop"]))
        if op == "create":
            name = data.draw(st.sampled_from(names))
            should_fail = name in model
            try:
                t = cat.create_table(
                    name, SCHEMA, key_cols=["conv_id", "turn_idx"],
                    n_buckets=2,
                )
                assert not should_fail
                model[name] = t.root
            except ValueError:
                assert should_fail
        elif op == "rename":
            old = data.draw(st.sampled_from(names))
            new = data.draw(st.sampled_from(names))
            try:
                cat.rename_table(old, new)
                assert old in model and (new not in model or new == old)
                model[new] = model.pop(old)
            except KeyError:
                assert old not in model
            except ValueError:
                assert new in model and new != old
        else:
            name = data.draw(st.sampled_from(names))
            try:
                cat.drop_table(name)
                assert name in model
                del model[name]
            except KeyError:
                assert name not in model
    assert cat.list_tables() == sorted(model)
    for ident, r in model.items():
        assert cat.load_table(ident).root == r
