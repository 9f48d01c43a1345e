"""Crash-orphan recovery at the CAS commit point (r4 ADVICE items).

A writer that dies between the ``O_EXCL`` manifest create (the durable
commit) and the ``CURRENT`` pointer rename leaves an orphan version file
that would otherwise block every later commit forever: ``manifest()``
keeps serving the stale base, ``_write_manifest`` keeps raising
``CommitConflict``, and the retry loops would spin. Recovery adopts a
COMPLETE orphan (the commit is durable — only the pointer is stale) and
surfaces a torn one as a clear bounded error instead of a livelock.

Also pins compact()'s COW conflict policy: a racing merge REPLACES
bucket dirs on a copy-on-write table, so a compaction retry that kept
its stale fold next to the racer's replacement would duplicate rows with
no LWW resolve to hide it — it must raise, mirroring merge().
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from etl_pipeline_spark.lake.minilake import CommitConflict, MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA

KEYS = ["conv_id", "turn_idx"]


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _table(spark, tmp_path, mode="mor"):
    t = MiniLakeTable.create(
        spark, str(tmp_path / f"t-{mode}"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=2, write_mode=mode,
    )
    t.merge(_src(spark, [("a", 0, "user", "v0", None, 1, "I")]), batch_id=0)
    return t


def _plant_valid_orphan(table) -> int:
    """Simulate a writer that died AFTER the manifest fsync, BEFORE the
    pointer rename: a complete v{cur+1} file exists, CURRENT lags."""
    base = table.manifest()
    orphan = dict(base)
    orphan["version"] = base["version"] + 1
    orphan["parent_snapshot_id"] = base["snapshot_id"]
    orphan["snapshot_id"] = str(uuid.uuid4())
    with open(table._manifest_path(orphan["version"]), "w") as f:
        json.dump(orphan, f)
    return orphan["version"]


def test_valid_orphan_is_adopted_and_commit_proceeds(spark, tmp_path):
    table = _table(spark, tmp_path)
    orphan_v = _plant_valid_orphan(table)
    assert table.current_version() == orphan_v - 1  # pointer is stale

    # a new merge conflicts on v{orphan}, adopts it, retries, lands
    res = table.merge(
        _src(spark, [("b", 0, "user", "v1", None, 2, "I")]), batch_id=1
    )
    assert not res.skipped
    assert res.version == orphan_v + 1
    assert table.current_version() == orphan_v + 1
    state = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert state == {"a": "v0", "b": "v1"}


def test_valid_orphan_unblocks_fence_only_commit(spark, tmp_path):
    table = _table(spark, tmp_path)
    orphan_v = _plant_valid_orphan(table)
    empty = _src(spark, []).filter("1=0")
    res = table.merge(empty, batch_id=1)  # fence-only path
    assert not res.skipped
    assert table.current_version() == orphan_v + 1


def test_torn_orphan_raises_bounded_error_not_livelock(spark, tmp_path):
    table = _table(spark, tmp_path)
    cur = table.current_version()
    torn = table._manifest_path(cur + 1)
    with open(torn, "w") as f:
        f.write('{"version": ')  # writer died mid-json.dump
    with pytest.raises(CommitConflict, match="torn|not a complete"):
        table.merge(
            _src(spark, [("b", 0, "user", "v1", None, 2, "I")]), batch_id=1
        )
    # the orphan was not adopted and the pointer never moved
    assert table.current_version() == cur
    # operator removes the torn file -> commits flow again
    os.remove(torn)
    res = table.merge(
        _src(spark, [("b", 0, "user", "v1", None, 2, "I")]), batch_id=1
    )
    assert not res.skipped


def test_compact_cow_conflict_raises_instead_of_duplicating(spark, tmp_path):
    """COW compaction losing its CAS must surface the conflict: its fold
    reflects bucket dirs a racing merge has since REPLACED."""
    table = _table(spark, tmp_path, mode="cow")
    racer = MiniLakeTable(spark, table.root)
    orig_write = table._write_manifest
    raced = []

    def write_with_race(manifest):
        if not raced:
            raced.append(True)
            racer.merge(
                _src(spark, [("a", 0, "user", "newer", None, 9, "U")]),
                batch_id=5,
            )
        orig_write(manifest)

    table._write_manifest = write_with_race
    try:
        with pytest.raises(CommitConflict):
            table.compact(drop_tombstones=False)
    finally:
        table._write_manifest = orig_write
    assert raced
    # the racer's update is intact and not duplicated by a stale fold
    rows = table.read().collect()
    assert [(r["conv_id"], r["text"]) for r in rows] == [("a", "newer")]
    # caller re-runs compaction on the fresh base and it lands cleanly
    v = table.compact(drop_tombstones=False)
    assert v == table.current_version()
    rows = table.read().collect()
    assert [(r["conv_id"], r["text"]) for r in rows] == [("a", "newer")]


def test_mor_compact_conflict_still_retries(spark, tmp_path):
    """The MOR retry (racers only append deltas; reads LWW-resolve) must
    keep working through the shared recovery path."""
    table = _table(spark, tmp_path)
    racer = MiniLakeTable(spark, table.root)
    orig_write = table._write_manifest
    raced = []

    def write_with_race(manifest):
        if not raced:
            raced.append(True)
            racer.merge(
                _src(spark, [("late", 0, "user", "late-v", None, 99, "I")]),
                batch_id=7,
            )
        orig_write(manifest)

    table._write_manifest = write_with_race
    try:
        table.compact(drop_tombstones=False)
    finally:
        table._write_manifest = orig_write
    assert raced
    state = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert state == {"a": "v0", "late": "late-v"}
