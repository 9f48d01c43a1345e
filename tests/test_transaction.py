"""Multi-table atomic transactions (lake/transaction.py): the claims —
a commit makes every participant visible and an abort none; the commit
point is the atomic txn-record flip (crash strictly before → recovery
aborts everything, strictly after → recovery completes everything,
idempotently through the fences); a replayed transaction is a fenced
no-op; and a blocked roll-forward surfaces as a pending txn rather
than a silent partial commit. The reference's analog is its ONE-table
Postgres transaction (load.py:190-290); these tests pin the multi-table
generalization a CDC fan-out needs."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import types as T

from etl_pipeline_spark.lake.catalog import MiniLakeCatalog
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.lake.transaction import (
    LakeTransaction,
    TransactionError,
    pending_transactions,
    recover_transactions,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)
STATS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), True),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = MiniLakeCatalog.create(spark, str(tmp_path / "lake"))
    c.create_table(
        "prod.transcripts", SCHEMA, key_cols=["conv_id", "turn_idx"],
        n_buckets=2, write_mode="mor",
    )
    c.create_table(
        "prod.conv_stats", STATS_SCHEMA, key_cols=["conv_id"],
        n_buckets=2, write_mode="mor", merge_engine="agg",
        agg_spec={"n_events": "sum"},
    )
    return c


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [(f"c{i % 3}", i, f"t{i}", i + 1, "I") for i in range(lo, hi)],
        "conv_id string, turn_idx int, text string, lsn long, op string",
    )


def _stats(spark, lo, hi):
    return spark.createDataFrame(
        [(f"c{i % 3}", 1, i + 1, "I") for i in range(lo, hi)],
        "conv_id string, n_events long, lsn long, op string",
    )


def _counts(cat):
    return (
        cat.load_table("prod.transcripts").read().count(),
        cat.load_table("prod.conv_stats").read().count(),
    )


def _staged_leftovers(cat):
    return glob.glob(
        os.path.join(cat.tables_dir, "*", "metadata", "staged", "*.json")
    )


def test_commit_applies_all_participants(spark, cat):
    with cat.transaction() as txn:
        txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
        txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)
        assert _counts(cat) == (0, 0)  # nothing visible before commit
    assert _counts(cat) == (6, 3)
    stats = {
        r["conv_id"]: r["n_events"]
        for r in cat.load_table("prod.conv_stats").read().collect()
    }
    assert stats == {"c0": 2, "c1": 2, "c2": 2}
    assert pending_transactions(cat) == []
    assert _staged_leftovers(cat) == []


def test_commit_returns_consistent_read_set(spark, cat):
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 4), batch_id=0)
    txn.merge("prod.conv_stats", _stats(spark, 0, 4), batch_id=0)
    results = txn.commit()
    assert set(results) == {"prod.transcripts", "prod.conv_stats"}
    for name, res in results.items():
        t = cat.load_table(name)
        assert t.read(version=res.version).count() == t.read().count()
        assert not res.skipped


def test_exception_aborts_and_leaves_no_trace(spark, cat):
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
            txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)
            raise RuntimeError("boom")
    assert _counts(cat) == (0, 0)
    assert pending_transactions(cat) == []
    assert _staged_leftovers(cat) == []


def test_crash_before_commit_point_recovers_to_nothing(spark, cat):
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)
    # crash: the txn object is dropped without commit or abort
    del txn
    assert len(pending_transactions(cat)) == 1
    rep = recover_transactions(cat)
    assert rep["aborted"] and not rep["completed"] and not rep["pending"]
    assert _counts(cat) == (0, 0)
    assert _staged_leftovers(cat) == []


def test_crash_mid_roll_forward_completes_on_recover(spark, cat, monkeypatch):
    """Crash strictly AFTER the commit point, between the two publishes:
    recovery must complete the second participant and re-run the first
    as a fenced/verified no-op — exactly-once on both."""
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)

    real = MiniLakeTable.publish_staged
    calls = {"n": 0}

    def flaky(self, wap_id):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash after first publish")
        return real(self, wap_id)

    monkeypatch.setattr(MiniLakeTable, "publish_staged", flaky)
    with pytest.raises(OSError, match="simulated crash"):
        txn.commit()
    monkeypatch.setattr(MiniLakeTable, "publish_staged", real)

    # partial-visibility window: first participant landed, second did not
    assert _counts(cat) == (6, 0)
    assert len(pending_transactions(cat)) == 1
    assert pending_transactions(cat)[0]["state"] == "committed"

    rep = recover_transactions(cat)
    assert rep["completed"] and not rep["aborted"] and not rep["pending"]
    assert _counts(cat) == (6, 3)
    # exactly-once: the re-published first participant did not double
    stats = {
        r["conv_id"]: r["n_events"]
        for r in cat.load_table("prod.conv_stats").read().collect()
    }
    assert stats == {"c0": 2, "c1": 2, "c2": 2}
    assert pending_transactions(cat) == []
    assert recover_transactions(cat) == {
        "aborted": [], "completed": [], "pending": []
    }


def test_replayed_transaction_is_fenced_noop(spark, cat):
    with cat.transaction() as txn:
        txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
        txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)
    v = {n: cat.load_table(n).current_version()
         for n in ("prod.transcripts", "prod.conv_stats")}
    # the whole txn replays (crash-retry of the driver loop): every
    # participant re-publish is fenced, no snapshot moves
    txn2 = cat.transaction()
    txn2.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    txn2.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)
    results = txn2.commit()
    assert all(r.skipped and r.reason == "fenced" for r in results.values())
    assert _counts(cat) == (6, 3)
    for n, res in results.items():
        assert cat.load_table(n).current_version() == v[n]
    assert _staged_leftovers(cat) == []


def test_external_writer_racing_roll_forward(spark, cat, monkeypatch):
    """Another (non-txn) writer applies the same (stream, batch) to one
    participant while the txn is crashed mid-commit-window: recovery's
    publish of that participant must fence, not double-apply."""
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)

    def crash(self, wap_id):
        raise OSError("crash before any publish")

    monkeypatch.setattr(MiniLakeTable, "publish_staged", crash)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.undo()

    # the external writer wins the race with recovery
    cat.load_table("prod.transcripts").merge(
        _batch(spark, 0, 6), batch_id=0
    )
    rep = recover_transactions(cat)
    assert rep["completed"]
    assert _counts(cat) == (6, 3)
    assert _staged_leftovers(cat) == []


def test_commit_refuses_incomplete_prepare(spark, cat, monkeypatch):
    """A participant recorded whose stage crashed before writing the
    staged descriptor: commit() must refuse BEFORE the commit point,
    leaving the txn abortable."""
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    # simulate the torn stage: record a participant, never stage it
    doc = dict(txn._doc)
    doc["participants"] = doc["participants"] + [{
        "table": "prod.conv_stats",
        "root": cat.load_table("prod.conv_stats").root,
        "wap_id": "txn-ghost-001",
        "stream_id": "default",
        "batch_id": 0,
    }]
    txn._write_record(doc)
    with pytest.raises(TransactionError, match="no completed stage"):
        txn.commit()
    txn.abort()
    assert _counts(cat) == (0, 0)
    assert pending_transactions(cat) == []
    assert _staged_leftovers(cat) == []


def test_rescale_blocked_while_txn_staged(spark, cat):
    """rescale_buckets itself refuses while a txn participant is staged
    (staged deltas are bucketed under the current modulus) — the txn's
    own rescaled-while-staged commit guard is second-line defense. The
    txn must still commit cleanly after the refused rescale."""
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    with pytest.raises(ValueError, match="staged commits pending"):
        cat.load_table("prod.transcripts").rescale_buckets(4)
    txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)
    txn.commit()
    assert _counts(cat) == (6, 3)
    assert pending_transactions(cat) == []


def test_lost_stage_after_commit_point_stays_pending(spark, cat, monkeypatch):
    """Staged files destroyed after the commit point with the fence NOT
    advanced: the one unrecoverable case — it must surface as a pending
    txn on every recovery, never as a silent partial commit."""
    txn = cat.transaction()
    txn.merge("prod.transcripts", _batch(spark, 0, 6), batch_id=0)
    txn.merge("prod.conv_stats", _stats(spark, 0, 6), batch_id=0)

    def crash(self, wap_id):
        raise OSError("crash before any publish")

    monkeypatch.setattr(MiniLakeTable, "publish_staged", crash)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.undo()

    # disaster: someone removes one participant's staged commit
    t = cat.load_table("prod.conv_stats")
    [staged] = glob.glob(os.path.join(t.meta_dir, "staged", "*.json"))
    os.remove(staged)

    rep = recover_transactions(cat)
    assert rep["pending"] and "neither a staged commit" in \
        rep["pending"][0]["error"]
    # the txn record survives so the skew stays visible
    assert pending_transactions(cat)[0]["state"] == "committed"


def test_torn_begin_record_recovers_as_empty_abort(spark, cat):
    os.makedirs(os.path.join(cat.meta_dir, "txns"), exist_ok=True)
    path = os.path.join(cat.meta_dir, "txns", "torn.json")
    with open(path, "w") as f:
        f.write('{"txn_id": "torn", "state": "prep')  # torn mid-dump
    rep = recover_transactions(cat)
    assert "torn" in rep["aborted"]
    assert not os.path.exists(path)


def test_empty_batch_participant_advances_fence(spark, cat):
    """An empty participant batch still commits a fence advance — the
    txn's exactly-once bookkeeping holds even when one table had no
    traffic this batch."""
    empty = _batch(spark, 0, 0)
    with cat.transaction() as txn:
        txn.merge("prod.transcripts", _batch(spark, 0, 4), batch_id=3)
        txn.merge("prod.conv_stats", empty, batch_id=3)
    t = cat.load_table("prod.conv_stats")
    from etl_pipeline_spark.lake.minilake import FENCES_PROP
    assert t.manifest()["properties"][FENCES_PROP]["default"] == 3
    assert _counts(cat) == (4, 0)


def test_duplicate_txn_id_refused(spark, cat):
    cat.transaction(txn_id="t1")
    with pytest.raises(TransactionError, match="already exists"):
        LakeTransaction(cat, "t1").begin()
    recover_transactions(cat)


def test_multi_batch_driver_loop(spark, cat):
    """The intended shape: a per-micro-batch txn fanning one stream out
    to both tables; final states match the one-shot equivalents."""
    for b in range(4):
        with cat.transaction() as txn:
            txn.merge(
                "prod.transcripts", _batch(spark, b * 5, b * 5 + 5),
                batch_id=b,
            )
            txn.merge(
                "prod.conv_stats", _stats(spark, b * 5, b * 5 + 5),
                batch_id=b,
            )
    assert _counts(cat) == (20, 3)
    stats = {
        r["conv_id"]: r["n_events"]
        for r in cat.load_table("prod.conv_stats").read().collect()
    }
    assert stats == {"c0": 7, "c1": 7, "c2": 6}
    assert pending_transactions(cat) == []


def test_concurrent_txns_converge_exactly_once(spark, cat):
    """Two drivers replaying the SAME per-batch txns race into the same
    two tables (the crash-retry topology: a zombie driver and its
    replacement both run the loop). Every batch must land exactly once
    on both tables — the publishes CAS-retry on conflicts and fence on
    duplicates — and no txn record or staged commit may survive."""
    import threading

    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def run(worker: int):
        barrier.wait()
        try:
            for b in range(4):
                try:
                    txn = cat.transaction(txn_id=f"w{worker}-b{b}")
                except TransactionError:
                    continue  # duplicate txn_id can't happen here; defensive
                txn.merge(
                    "prod.transcripts", _batch(spark, b * 5, b * 5 + 5),
                    batch_id=b,
                )
                txn.merge(
                    "prod.conv_stats", _stats(spark, b * 5, b * 5 + 5),
                    batch_id=b,
                )
                txn.commit()
        except Exception as e:  # pragma: no cover - assertion target
            errors.append(e)

    threads = [threading.Thread(target=run, args=(w,)) for w in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # exactly-once convergence: same totals as one sequential pass
    assert _counts(cat) == (20, 3)
    stats = {
        r["conv_id"]: r["n_events"]
        for r in cat.load_table("prod.conv_stats").read().collect()
    }
    assert stats == {"c0": 7, "c1": 7, "c2": 6}
    assert pending_transactions(cat) == []
    assert _staged_leftovers(cat) == []
