"""Branch refs: write-to-branch, fast-forward, cherry-pick.

Iceberg branches on the MiniLake backend — the multi-commit
generalization of WAP staging: ``merge(to_branch=...)`` appends fenced
commits to a named lineage diverging at a base snapshot, ``main``
readers see nothing until ``fast_forward`` (main unmoved) or
``cherry_pick_branch`` (rebase onto an advanced main; sound because MOR
deltas are base-independent). The audit-before-publish discipline the
reference's all-or-nothing truncate+insert load
(/root/reference/utils/load.py:213-271) grows into when a whole
multi-batch backfill must be inspected before readers can see any of it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.lake.minilake import (
    CommitConflict,
    FENCES_PROP,
    MiniLakeTable,
)
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

KEYS = ["conv_id", "turn_idx"]


def _table(spark, tmp_path, n_buckets=8, write_mode="mor", name="t"):
    return MiniLakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=n_buckets,
        write_mode=write_mode,
    )


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string",
    )


def _state(t, **read_kwargs):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(**read_kwargs).collect()
    }


def _seeded(spark, tmp_path, **kwargs):
    t = _table(spark, tmp_path, **kwargs)
    t.merge(
        _src(spark, [
            ("a", 0, "user", "hello", None, 1, "I"),
            ("b", 0, "user", "hi", None, 2, "I"),
        ]),
        batch_id=0,
        stream_id="main",
    )
    return t


def test_branch_isolated_until_fast_forward(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v0 = t.current_version()
    t.create_branch("backfill")
    r1 = t.merge(
        _src(spark, [("a", 0, "user", "hello v2", None, 10, "U")]),
        batch_id=0, stream_id="bf", to_branch="backfill",
    )
    r2 = t.merge(
        _src(spark, [
            ("c", 0, "user", "new", None, 11, "I"),
            ("b", 0, None, None, None, 12, "D"),
        ]),
        batch_id=1, stream_id="bf", to_branch="backfill",
    )
    assert not r1.skipped and not r2.skipped
    assert r1.branch == r2.branch == "backfill"
    # main is untouched — no snapshot moved, state unchanged
    assert t.current_version() == v0
    assert _state(t) == {("a", 0): "hello", ("b", 0): "hi"}
    # the branch read folds base + both commits
    assert _state(t, branch="backfill") == {
        ("a", 0): "hello v2",
        ("c", 0): "new",
    }
    results = t.fast_forward("backfill")
    # each branch commit lands as its own snapshot (per-commit history)
    assert [r.version for r in results] == [v0 + 1, v0 + 2]
    assert _state(t) == {("a", 0): "hello v2", ("c", 0): "new"}
    assert t.branches() == []
    # branch fences carried to main: re-delivering either batch is a no-op
    redo = t.merge(
        _src(spark, [("a", 0, "user", "ZOMBIE", None, 99, "U")]),
        batch_id=1, stream_id="bf",
    )
    assert redo.skipped and redo.reason == "fenced"


def test_branch_local_fencing(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("b1")
    t.merge(
        _src(spark, [("a", 0, "user", "x", None, 10, "U")]),
        batch_id=3, stream_id="bf", to_branch="b1",
    )
    dup = t.merge(
        _src(spark, [("a", 0, "user", "ZOMBIE", None, 99, "U")]),
        batch_id=3, stream_id="bf", to_branch="b1",
    )
    assert dup.skipped and dup.reason == "fenced" and dup.branch == "b1"
    # base fences count too: the seed batch (main, 0) is fenced on-branch
    dup2 = t.merge(
        _src(spark, [("a", 0, "user", "ZOMBIE", None, 99, "U")]),
        batch_id=0, stream_id="main", to_branch="b1",
    )
    assert dup2.skipped and dup2.reason == "fenced"
    assert _state(t, branch="b1") == {("a", 0): "x", ("b", 0): "hi"}


def test_empty_branch_batch_advances_branch_fence(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("b1")
    res = t.merge(
        _src(spark, []).limit(0),
        batch_id=7, stream_id="bf", to_branch="b1",
    )
    assert not res.skipped  # a data-free commit, not a silent skip
    redo = t.merge(
        _src(spark, [("z", 0, "user", "late", None, 50, "I")]),
        batch_id=7, stream_id="bf", to_branch="b1",
    )
    assert redo.skipped and redo.reason == "fenced"
    # publishing the data-free commit advances main's fence too
    t.fast_forward("b1")
    assert t.snapshot_props()[FENCES_PROP]["bf"] == 7


def test_fast_forward_requires_unmoved_main(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("bf")
    t.merge(
        _src(spark, [("c", 0, "user", "branch row", None, 20, "I")]),
        batch_id=0, stream_id="bf", to_branch="bf",
    )
    # main advances past the divergence point
    t.merge(
        _src(spark, [("d", 0, "user", "main row", None, 21, "I")]),
        batch_id=1, stream_id="main",
    )
    with pytest.raises(CommitConflict, match="cherry_pick_branch"):
        t.fast_forward("bf")
    # the rebase path converges: both lineages' rows land
    results = t.cherry_pick_branch("bf")
    assert [r.skipped for r in results] == [False]
    assert _state(t) == {
        ("a", 0): "hello",
        ("b", 0): "hi",
        ("c", 0): "branch row",
        ("d", 0): "main row",
    }
    assert t.branches() == []


def test_cherry_pick_drops_batches_main_already_applied(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("bf")
    t.merge(
        _src(spark, [("c", 0, "user", "from branch", None, 20, "I")]),
        batch_id=1, stream_id="main", to_branch="bf",
    )
    # a concurrent replay applies the SAME (stream, batch) to main
    t.merge(
        _src(spark, [("c", 0, "user", "from main", None, 20, "I")]),
        batch_id=1, stream_id="main",
    )
    results = t.cherry_pick_branch("bf")
    assert [r.skipped for r in results] == [True]
    assert results[0].reason == "fenced"
    assert _state(t)[("c", 0)] == "from main"
    # the dropped commit's delta dirs were reclaimed, not leaked
    rep = t.expire_snapshots(keep_last=100, orphan_min_age_s=0.0)
    assert rep["dirs_removed"] == 0 and rep["young_orphans_skipped"] == 0


def test_delete_branch_discards_everything(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    v0 = t.current_version()
    t.create_branch("scrap")
    t.merge(
        _src(spark, [("z", 0, "user", "discard me", None, 30, "I")]),
        batch_id=0, stream_id="scrap", to_branch="scrap",
    )
    t.delete_branch("scrap")
    assert t.branches() == []
    assert t.current_version() == v0
    assert _state(t) == {("a", 0): "hello", ("b", 0): "hi"}
    # data dirs gone too — nothing for orphan GC to find
    rep = t.expire_snapshots(keep_last=100, orphan_min_age_s=0.0)
    assert rep["dirs_removed"] == 0
    with pytest.raises(KeyError):
        t.delete_branch("scrap")


def test_gc_pins_branch_base_and_deltas(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("old")
    t.merge(
        _src(spark, [("a", 0, "user", "branched", None, 10, "U")]),
        batch_id=0, stream_id="bf", to_branch="old",
    )
    # main advances well past the retention window
    for i in range(1, 6):
        t.merge(
            _src(spark, [("m", i, "user", f"main {i}", None, 100 + i, "I")]),
            batch_id=i, stream_id="main",
        )
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    # the branch still reads: base snapshot pinned, delta dirs kept live
    assert _state(t, branch="old") == {
        ("a", 0): "branched",
        ("b", 0): "hi",
    }
    # and it still publishes (rebase — main moved)
    t.cherry_pick_branch("old")
    assert _state(t)[("a", 0)] == "branched"


def test_rescale_blocked_while_branch_pending(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("bf")
    with pytest.raises(ValueError, match="branches pending"):
        t.rescale_buckets(4)
    t.delete_branch("bf")
    t.rescale_buckets(4)  # clear after the branch is gone


def test_concurrent_branch_writers_exactly_once(spark, tmp_path):
    """Two writers racing the SAME batches into one branch: the O_EXCL
    commit-slot claim plus the per-retry fence re-check must land every
    batch exactly once (the loser's delta dirs drop), and the published
    state must equal single-writer LWW."""
    import threading

    t = _seeded(spark, tmp_path)
    t.create_branch("race")
    batches = [
        [("a", 0, "user", "v1", None, 10, "U"),
         ("c", 0, "user", "c0", None, 11, "I")],
        [("a", 0, "user", "v2", None, 20, "U")],
        [("c", 0, None, None, None, 21, "D")],
        [("d", 0, "user", "d0", None, 22, "I")],
    ]
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def run():
        barrier.wait()
        try:
            for i, rows in enumerate(batches):
                t.merge(
                    _src(spark, rows), batch_id=i, stream_id="bf",
                    to_branch="race",
                )
        except Exception as e:  # pragma: no cover - assertion target
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    commits = t._branch_commits("race")
    assert sorted((c["stream_id"], c["batch_id"]) for c in commits) == [
        ("bf", i) for i in range(4)
    ]
    t.fast_forward("race")
    assert _state(t) == {
        ("a", 0): "v2",
        ("b", 0): "hi",
        ("d", 0): "d0",
    }
    # the losers' duplicate delta dirs were reclaimed, not leaked
    rep = t.expire_snapshots(keep_last=100, orphan_min_age_s=0.0)
    assert rep["dirs_removed"] == 0 and rep["young_orphans_skipped"] == 0


def test_branch_requires_mor_and_unique_name(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    t.create_branch("bf")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("bf")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("../evil")
    cow = _table(spark, tmp_path, write_mode="cow", name="cow")
    with pytest.raises(ValueError, match="merge-on-read"):
        cow.create_branch("bf")


def test_replay_changelog_onto_branch_then_publish(spark, tmp_path):
    """Audited backfill end-to-end: the full dirty changelog replays
    onto a branch (branch-local fences make it idempotent/resumable),
    main provably serves nothing until publish, and after fast_forward
    the state equals the independent generator oracle — byte-for-byte
    what a direct main replay produces."""
    import pandas as pd

    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.sources.genlog import (
        GenConfig,
        expected_final_state,
        generate_delivered_events,
        write_changelog,
    )
    from etl_pipeline_spark.streaming.ingest import replay_files

    cfg = GenConfig(
        n_events=6_000, batch_size=1_000, shuffle_window=200,
        dup_delivery_rate=0.02, dead_letter_rate=0.01,
    )
    changelog = str(tmp_path / "clog")
    write_changelog(cfg, changelog)
    t = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=8, write_mode="mor",
    )
    t.create_branch("backfill")
    n = replay_files(spark, changelog, t, to_branch="backfill")
    assert n >= 6
    assert t.read().count() == 0  # main untouched through the backfill
    # a crash-resume re-replay is all fenced no-ops on the branch
    assert replay_files(spark, changelog, t, to_branch="backfill") == n
    assert len(t._branch_commits("backfill")) == n
    results = t.fast_forward("backfill")
    assert all(not r.skipped for r in results)
    exp = expected_final_state(generate_delivered_events(cfg))
    got = (
        t.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    a = ["∅" if pd.isna(x) else x for x in got["text"]]
    b = ["∅" if pd.isna(x) else x for x in exp["text"]]
    assert a == b
    # dead letters were quarantined during the branch replay too
    # (legacy split path — fusion is main-only)
    import os as _os

    assert _os.path.isdir(_os.path.join(t.root, "_deadletter"))


def test_branch_backfill_rejects_inflight_evolution(spark, tmp_path):
    """A batch birthing a new column mid-branch-backfill must fail loud:
    branch writes resolve against the base snapshot's schema, so
    evolving main underneath would silently drop the column from every
    branch commit."""
    t = _seeded(spark, tmp_path)
    t.create_branch("bf")
    from etl_pipeline_spark.pipeline import apply_batch

    evolved = spark.createDataFrame(
        [("c", 0, "user", "x", "hammer", None, 30, "I")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, lsn long, op string",
    )
    with pytest.raises(ValueError, match="branch backfill"):
        apply_batch(t, evolved, batch_id=0, to_branch="bf")
    # main's schema was not mutated by the failed attempt
    assert "tool" not in [f.name for f in t.schema().fields]


def test_published_branch_feeds_cdc_out(spark, tmp_path):
    """After fast_forward, the branch's commits ARE ordinary snapshots:
    read_changes_since(base) must serve exactly the branch rows
    (tombstones included) — the replication chain needs no special
    casing for branch-published history."""
    t = _seeded(spark, tmp_path)
    v0 = t.current_version()
    t.create_branch("bf")
    t.merge(
        _src(spark, [("c", 0, "user", "via branch", None, 20, "I")]),
        batch_id=0, stream_id="bf", to_branch="bf",
    )
    t.merge(
        _src(spark, [("a", 0, None, None, None, 21, "D")]),
        batch_id=1, stream_id="bf", to_branch="bf",
    )
    t.fast_forward("bf")
    ch = t.read_changes_since(v0)
    rows = {(r["conv_id"], r["_deleted"]) for r in ch.collect()}
    assert rows == {("c", False), ("a", True)}
