"""Shallow clones (Delta SHALLOW CLONE analog): metadata-only, the
clone references the source's data dirs, diverges privately on write,
and is pinned against the source's retention GC by an auto-created
source tag. Neither side's writes or GC may ever touch the other's
files — the structural invariant every test here leans on."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.lake.minilake import (
    CLONE_OF_PROP,
    CLONE_TAG_PROP,
    MiniLakeTable,
)
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _rows(spark, tag, n, op="U", base_lsn=0):
    return spark.createDataFrame(
        [
            (
                f"c{i}", 0, "user", f"{tag}-{i}",
                datetime.datetime(2024, 1, 1), base_lsn + i + 1, op,
            )
            for i in range(n)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path, name="src", mode="mor"):
    return MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=4,
        write_mode=mode,
    )


def _snap(t, **kw):
    return sorted(map(tuple, t.read(**kw).collect()))


def test_clone_reads_equal_source_and_diverges_on_write(spark, tmp_path):
    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 10), batch_id=0)
    clone = src.shallow_clone(str(tmp_path / "clone"))
    assert _snap(clone) == _snap(src)
    props = clone.snapshot_props()
    assert props[CLONE_OF_PROP] == src.root
    assert props[CLONE_TAG_PROP] in src.tags()
    # diverge: each side gets its own follow-up batch
    src.merge(_rows(spark, "s", 3, base_lsn=100), batch_id=1)
    clone.merge(_rows(spark, "k", 2, base_lsn=200), batch_id=1)
    src_texts = {r["text"] for r in src.read().collect()}
    clone_texts = {r["text"] for r in clone.read().collect()}
    assert "s-0" in src_texts and "s-0" not in clone_texts
    assert "k-0" in clone_texts and "k-0" not in src_texts
    # clone deltas live under the CLONE's root
    new_dirs = [
        d
        for ds in clone.manifest()["buckets"].values()
        for d in ds
        if not d.startswith(src.root)
    ]
    assert new_dirs and all(d.startswith(clone.root) for d in new_dirs)


def test_clone_survives_source_retention_gc(spark, tmp_path):
    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 8), batch_id=0)
    clone = src.shallow_clone(str(tmp_path / "clone"))
    want = _snap(clone)
    # source moves on and aggressively GCs — the clone tag must pin the
    # shared dirs
    src.merge(_rows(spark, "a", 8, op="D", base_lsn=100), batch_id=1)
    src.compact(drop_tombstones=True)
    src.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    assert _snap(clone) == want
    # dropping the pin is the documented way to break the clone
    src.delete_tag(clone.snapshot_props()[CLONE_TAG_PROP])


def test_clone_gc_never_touches_source_files(spark, tmp_path):
    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 8), batch_id=0)
    want_src = _snap(src)
    clone = src.shallow_clone(str(tmp_path / "clone"))
    clone.merge(_rows(spark, "k", 4, base_lsn=100), batch_id=1)
    clone.compact(drop_tombstones=True)  # dereferences the shared dirs
    clone.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    # the clone folded everything into its own root; source untouched
    assert _snap(src) == want_src
    assert _snap(clone, version=clone.current_version()) != want_src


def test_clone_continues_source_fences(spark, tmp_path):
    src = _table(spark, tmp_path)
    batch = _rows(spark, "a", 6)
    src.merge(batch, batch_id=0)
    clone = src.shallow_clone(str(tmp_path / "clone"))
    want = _snap(clone)
    clone.merge(batch, batch_id=0)  # replay of an applied batch
    assert _snap(clone) == want  # fenced no-op, not a double-apply


def test_clone_rejects_existing_destination(spark, tmp_path):
    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 2), batch_id=0)
    src.shallow_clone(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="already exists"):
        src.shallow_clone(str(tmp_path / "clone"))


def test_clone_of_pinned_old_version(spark, tmp_path):
    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 5), batch_id=0)
    v1 = src.current_version()
    src.merge(_rows(spark, "b", 5, base_lsn=100), batch_id=1)
    clone = src.shallow_clone(str(tmp_path / "clone"), version=v1)
    texts = {r["text"] for r in clone.read().collect()}
    assert texts == {f"a-{i}" for i in range(5)}


def test_clone_of_unlocalized_clone_is_refused_until_compacted(
    spark, tmp_path
):
    """Second-hop clones would ride the FIRST clone's source pin —
    dropping the intermediate clone would silently break them. The
    engine refuses until compact() localizes the data, after which the
    clone is a self-contained source and cloning it is the ordinary
    single-hop case."""
    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 6), batch_id=0)
    c1 = src.shallow_clone(str(tmp_path / "c1"))
    with pytest.raises(ValueError, match="localize"):
        c1.shallow_clone(str(tmp_path / "c2"))
    c1.compact(drop_tombstones=True)  # every dir now under c1's root
    c2 = c1.shallow_clone(str(tmp_path / "c2"))
    assert _snap(c2) == _snap(src)
    # c2's pin lives on c1, whose data no longer depends on src
    assert c2.snapshot_props()[CLONE_OF_PROP] == c1.root
    assert c2.snapshot_props()[CLONE_TAG_PROP] in c1.tags()


def test_clone_racing_gc_fails_clean_and_retries(spark, tmp_path):
    """Adversarial interleaving: a source expire_snapshots that read the
    tag registry BEFORE the clone's pin landed deletes the shared dirs.
    The clone must detect the lost race after pinning, undo (no dest,
    no dangling tag) and raise a retryable CommitConflict; the retry —
    now visibly pinned — succeeds."""
    import shutil as _shutil

    from etl_pipeline_spark.lake.minilake import CommitConflict

    src = _table(spark, tmp_path)
    src.merge(_rows(spark, "a", 6), batch_id=0)
    src.merge(_rows(spark, "b", 4, base_lsn=100), batch_id=1)
    doomed_version = src.current_version()
    orig = src.create_tag
    fired = {"n": 0}

    def hooked(name, version=None):
        got = orig(name, version)
        if fired["n"] == 0:
            fired["n"] = 1
            # emulate the GC that had already enumerated tags (without
            # our pin): wipe the snapshot's dirs and manifests behind
            # the clone's back
            for d in os.listdir(src.data_dir):
                _shutil.rmtree(os.path.join(src.data_dir, d))
            for v in range(1, doomed_version + 1):
                p = src._manifest_path(v)
                if os.path.exists(p):
                    os.remove(p)
        return got

    src.create_tag = hooked
    try:
        with pytest.raises(CommitConflict, match="raced retention GC"):
            src.shallow_clone(str(tmp_path / "clone"))
    finally:
        src.create_tag = orig
    assert not MiniLakeTable.exists(str(tmp_path / "clone"))
    assert not any(t.startswith("clone-") for t in src.tags())
