"""Multi-table atomic transactions over the MiniLake catalog.

A CDC stream rarely feeds ONE table: the base transcripts table plus
derived tables (per-conversation stats, audit feeds, search projections)
must move together, or a crash leaves the derivatives ahead of or behind
the base with no record of the skew. The reference gets its
all-or-nothing guarantee from a single-table database transaction
(``/root/reference/utils/load.py:190-290`` — truncate+insert inside one
Postgres txn); this module generalizes it across MANY lake tables, the
way an Iceberg REST catalog's multi-table commit does.

Protocol — two-phase commit built entirely from existing primitives:

1. **Prepare** — each participant batch is staged with the table's own
   WAP path (``merge(stage_to=...)``): the expensive write job runs,
   data lands in unreferenced MOR delta dirs, NOTHING is visible. The
   participant is recorded in the txn log BEFORE its stage runs, so a
   crash mid-stage leaves at worst an orphan delta dir (reaped by the
   age-guarded orphan GC), never an unreferenced staged commit.
2. **Commit point** — one atomic rename flips the txn record from
   ``prepared`` to ``committed``. Strictly before this instant a
   recovery ABORTS every participant; strictly after, recovery ROLLS
   FORWARD every participant. There is no third outcome.
3. **Roll forward** — each staged batch is published
   (``publish_staged``: metadata-only CAS). Publishes are idempotent
   through the per-stream batch-id fences, so a crash between two
   publishes — or between the last publish and the txn-record removal —
   re-runs as fenced no-ops on the already-published tables.

Atomicity is therefore *durability-atomic*: after
:func:`recover_transactions`, either every participant's batch is
applied exactly once or none is. Visibility during a healthy commit
window is per-table (each publish is its own snapshot swap, same as
Iceberg multi-table commits against catalogs without multi-table swap
support); a consumer needing a cross-table-consistent view reads each
table ``AS OF`` the per-table versions returned by :meth:`commit`,
which all belong to the same transaction.

Failure honesty: if a participant table is rescaled
(``rescale_buckets``) while the txn is in its commit window, that
participant's publish raises ``CommitConflict`` — past the commit point
the txn CANNOT be rolled back (other participants may already be
visible), so the txn record is KEPT and :class:`TransactionPending`
surfaces on every recovery until the operator re-stages the blocked
batch (the recorded stream/batch ids say exactly what is missing).
A silent partial commit is never an outcome.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from .minilake import (
    FENCES_PROP,
    CommitConflict,
    MergeResult,
    MiniLakeTable,
)


class TransactionError(RuntimeError):
    pass


class TransactionPending(TransactionError):
    """A COMMITTED transaction whose roll-forward is blocked (e.g. a
    participant was rescaled while staged). The txn record is retained;
    recovery will retry. Never raised for anything abortable."""


def _txn_dir(catalog) -> str:
    return os.path.join(catalog.meta_dir, "txns")


class LakeTransaction:
    """One multi-table transaction. Use via
    ``with catalog.transaction() as txn: txn.merge(...)`` — the context
    manager commits on success and aborts on any exception — or drive
    :meth:`begin` / :meth:`merge` / :meth:`commit` / :meth:`abort`
    explicitly."""

    def __init__(self, catalog, txn_id: str | None = None):
        self.catalog = catalog
        self.txn_id = txn_id or uuid.uuid4().hex
        if "/" in self.txn_id or self.txn_id.startswith("."):
            raise ValueError(f"invalid txn_id {self.txn_id!r}")
        self.path = os.path.join(_txn_dir(catalog), f"{self.txn_id}.json")
        self._doc: dict | None = None

    # ------------------------------------------------------- txn record

    def _write_record(self, doc: dict) -> None:
        """Atomic full-record replace (tmp + fsync + rename) — a reader
        or recovery never sees a torn participant list."""
        tmp = f"{self.path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
        self._doc = doc

    def begin(self) -> "LakeTransaction":
        os.makedirs(_txn_dir(self.catalog), exist_ok=True)
        doc = {
            "txn_id": self.txn_id,
            "state": "prepared",
            "participants": [],
            "begun_at": time.time(),
        }
        try:
            fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            raise TransactionError(
                f"transaction {self.txn_id!r} already exists"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        self._doc = doc
        return self

    # ------------------------------------------------------- prepare

    def merge(
        self,
        table_name: str,
        source,
        batch_id: int,
        stream_id: str = "default",
        **merge_kwargs,
    ) -> MergeResult:
        """Stage one participant batch (WAP prepare). The participant is
        recorded in the txn log first, then staged — crash between the
        two leaves only an orphan delta dir for the age-guarded GC.
        Requires a merge-on-read table (same constraint as
        ``stage_to``). Extra kwargs pass through to
        :meth:`MiniLakeTable.merge` (``lsn_col``, ``op_col``, …)."""
        doc = self._require("prepared")
        table = self.catalog.load_table(table_name)
        wap_id = f"txn-{self.txn_id}-{len(doc['participants']):03d}"
        part = {
            "table": table_name,
            "root": table.root,
            "wap_id": wap_id,
            "stream_id": stream_id,
            "batch_id": int(batch_id),
        }
        doc = dict(doc, participants=doc["participants"] + [part])
        self._write_record(doc)
        res = table.merge(
            source,
            batch_id=batch_id,
            stream_id=stream_id,
            stage_to=wap_id,
            **merge_kwargs,
        )
        if not res.staged:
            # the batch was fenced AT STAGE TIME (already applied by an
            # earlier run) — nothing staged, nothing to publish; mark the
            # participant so commit/recovery verify through the fence
            parts = list(self._doc["participants"])
            parts[-1] = dict(parts[-1], pre_fenced=True)
            self._write_record(dict(self._doc, participants=parts))
        return res

    def _require(self, state: str) -> dict:
        if self._doc is None:
            raise TransactionError("transaction not begun")
        if self._doc["state"] != state:
            raise TransactionError(
                f"transaction {self.txn_id!r} is "
                f"{self._doc['state']!r}, expected {state!r}"
            )
        return self._doc

    # ------------------------------------------------------- commit/abort

    def commit(self) -> dict[str, MergeResult]:
        """Atomically commit every staged participant. Returns
        ``{table_name: MergeResult}`` — the per-table committed versions
        form the transaction's cross-table-consistent read set.

        Validation failures BEFORE the commit point (a participant whose
        stage never completed, a bucket-layout change while staged) raise
        with the txn still abortable. After the commit point the txn can
        only roll forward; see module docstring."""
        doc = self._require("prepared")
        # pre-validate while abort is still an option: every recorded
        # participant must have a completed stage under the layout it
        # was written against
        for p in doc["participants"]:
            if p.get("pre_fenced"):
                continue  # nothing staged; verified via the fence below
            table = MiniLakeTable(self.catalog.spark, p["root"])
            try:
                desc = table._load_staged(p["wap_id"])
            except KeyError:
                raise TransactionError(
                    f"participant {p['table']!r} (wap {p['wap_id']!r}) "
                    "has no completed stage — its prepare crashed; "
                    "abort() and retry the transaction"
                ) from None
            if table.manifest()["n_buckets"] != desc["n_buckets"]:
                raise TransactionError(
                    f"participant {p['table']!r} was rescaled while "
                    "staged; abort() and retry under the new layout"
                )
        # THE commit point: one atomic record flip
        self._write_record(dict(doc, state="committed",
                                committed_at=time.time()))
        return self._roll_forward()

    def _roll_forward(self) -> dict[str, MergeResult]:
        """Publish every participant; idempotent across crash/retry via
        the per-stream fences. Removes the txn record only after EVERY
        participant is verifiably applied."""
        doc = self._require("committed")
        results: dict[str, MergeResult] = {}
        for p in doc["participants"]:
            table = MiniLakeTable(self.catalog.spark, p["root"])
            if p.get("pre_fenced"):
                m = table.manifest()
                results[p["table"]] = MergeResult(
                    skipped=True, reason="fenced",
                    version=m["version"], snapshot_id=m["snapshot_id"],
                )
                continue
            try:
                results[p["table"]] = table.publish_staged(p["wap_id"])
            except CommitConflict as exc:
                # e.g. a bucket rescale raced the commit window (the
                # in-process rescale guard checks list_staged(), which a
                # participant recorded-but-not-yet-staged evades).
                # Surface as TransactionPending with the record KEPT —
                # the module contract — so recover_transactions degrades
                # per-txn instead of aborting recovery of the rest.
                raise TransactionPending(
                    f"txn {self.txn_id!r}: participant {p['table']!r} "
                    f"hit a commit conflict during publish ({exc}); the "
                    "txn record is kept — resolve the conflict (e.g. "
                    "re-run recovery after the racing maintenance "
                    "finishes)"
                ) from exc
            except KeyError:
                # staged descriptor gone — this participant was already
                # published by an earlier roll-forward attempt; verify
                # through the fence rather than trusting the absence
                m = table.manifest()
                hw = m["properties"].get(FENCES_PROP, {}).get(
                    p["stream_id"], -1
                )
                if hw >= p["batch_id"]:
                    results[p["table"]] = MergeResult(
                        skipped=True,
                        reason="already published",
                        version=m["version"],
                        snapshot_id=m["snapshot_id"],
                    )
                else:
                    raise TransactionPending(
                        f"txn {self.txn_id!r}: participant "
                        f"{p['table']!r} has neither a staged commit nor "
                        f"an advanced fence (stream {p['stream_id']!r} "
                        f"at {hw}, need ≥ {p['batch_id']}) — staged "
                        "files lost after the commit point; re-stage "
                        f"batch {p['batch_id']} and publish manually"
                    ) from None
        os.remove(self.path)
        self._doc = dict(self._doc, state="completed")
        return results

    def abort(self) -> None:
        """Discard every staged participant and the txn record. Only
        legal before the commit point."""
        doc = self._require("prepared")
        for p in doc["participants"]:
            table = MiniLakeTable(self.catalog.spark, p["root"])
            try:
                table.abort_staged(p["wap_id"])
            except KeyError:
                pass  # stage never completed — nothing staged to drop
        os.remove(self.path)
        self._doc = dict(doc, state="aborted")

    # ------------------------------------------------------- context mgr

    def __enter__(self) -> "LakeTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if self._doc is None or self._doc["state"] in (
            "completed", "aborted",
        ):
            return False  # explicitly resolved inside the block
        if exc_type is None:
            self.commit()
        elif self._doc["state"] == "prepared":
            self.abort()
        # a committed-but-pending txn is deliberately left for recovery
        return False


def pending_transactions(catalog) -> list[dict]:
    """All txn records still on disk (prepared or committed), oldest
    first. Driver-side metadata; O(pending txns)."""
    out = []
    for path in sorted(glob.glob(os.path.join(_txn_dir(catalog), "*.json"))):
        try:
            with open(path) as f:
                out.append(json.load(f))
        except (json.JSONDecodeError, FileNotFoundError):
            # torn initial create (crash mid-begin) — no participant can
            # have been recorded; surfaces as an abortable empty txn
            out.append({
                "txn_id": os.path.basename(path)[:-5],
                "state": "prepared",
                "participants": [],
                "torn": True,
            })
    return out


def recover_transactions(catalog) -> dict:
    """Resolve every pending transaction: ``prepared`` → abort (staged
    participants discarded), ``committed`` → roll forward (idempotent
    publishes). Run at engine startup, exactly like a WAL recovery.

    Returns ``{"aborted": [...], "completed": [...], "pending": [...]}``;
    a committed txn whose roll-forward is still blocked stays in
    ``pending`` (with the error string) rather than raising, so one
    stuck txn cannot stop the others from recovering."""
    aborted, completed, pending = [], [], []
    for doc in pending_transactions(catalog):
        txn = LakeTransaction(catalog, doc["txn_id"])
        txn._doc = doc
        if doc["state"] == "prepared":
            txn.abort()
            aborted.append(doc["txn_id"])
        else:
            try:
                txn._roll_forward()
                completed.append(doc["txn_id"])
            except TransactionPending as e:
                pending.append({"txn_id": doc["txn_id"], "error": str(e)})
    return {"aborted": aborted, "completed": completed, "pending": pending}
