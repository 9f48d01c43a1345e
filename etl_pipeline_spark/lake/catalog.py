"""MiniLake catalog — namespaced table identifiers over the lake.

The catalog is an INDIRECTION, exactly like an Iceberg catalog: it maps
``namespace.table`` identifiers to physical table roots and nothing
else. Physical roots live under ``<root>/tables/<uuid>/`` and are NEVER
renamed — so ``rename_table`` is one atomic catalog-pointer commit (the
table's manifests, which hold absolute data paths, stay valid), and a
reader holding a ``MiniLakeTable`` keeps working across any rename.

Catalog state is versioned with the same CAS scheme as table manifests:
``catalog/v{N}.json`` created with O_EXCL (concurrent writers: exactly
one wins, the loser gets :class:`CommitConflict` and retries on the
fresh state), then an atomic ``CURRENT`` pointer rename. Every
operation is a single catalog commit; a crash between the O_EXCL create
and the pointer rename is repaired by the same adopt-the-committed-
version recovery the table manifest uses.

The reference has no notion of a catalog at all — its one output table
is a hard-coded destination (/root/reference/utils/load.py:190-290).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .minilake import CommitConflict, MiniLakeTable


def _valid_ident(name: str) -> tuple[str, str]:
    """Split and validate ``namespace.table`` (namespace defaults to
    ``default``)."""
    parts = name.split(".")
    if len(parts) == 1:
        parts = ["default"] + parts
    if len(parts) != 2 or not all(
        p and not p.startswith(".") and "/" not in p and "\x00" not in p
        for p in parts
    ):
        raise ValueError(
            f"invalid table identifier {name!r} — use 'table' or "
            "'namespace.table'"
        )
    return parts[0], parts[1]


class MiniLakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "catalog")
        self.tables_dir = os.path.join(root, "tables")

    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "MiniLakeCatalog":
        c = cls(spark, root)
        os.makedirs(c.meta_dir, exist_ok=True)
        os.makedirs(c.tables_dir, exist_ok=True)
        if not os.path.exists(os.path.join(c.meta_dir, "CURRENT")):
            c._write_state({"version": 1, "tables": {},
                            "committed_at": time.time()})
        return c

    # ------------------------------------------------------ state CAS

    def _state_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.json")

    def _current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def state(self) -> dict:
        self._recover_current()
        with open(self._state_path(self._current_version())) as f:
            return json.load(f)

    def _recover_current(self) -> None:
        """Adopt a committed v-file past CURRENT (crash between the
        O_EXCL create and the pointer rename) — the same repair the
        table manifest does, so a torn commit can never livelock the
        CAS."""
        cur_path = os.path.join(self.meta_dir, "CURRENT")
        if not os.path.exists(cur_path):
            return
        with open(cur_path) as f:
            cur = int(f.read().strip())
        adopted = cur
        while True:
            nxt = self._state_path(adopted + 1)
            if not os.path.exists(nxt):
                break
            try:
                with open(nxt) as f:
                    json.load(f)  # torn write → do not adopt
            except Exception:
                break
            adopted += 1
        if adopted != cur:
            tmp = cur_path + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                f.write(str(adopted))
            os.replace(tmp, cur_path)

    def _write_state(self, state: dict) -> None:
        path = self._state_path(state["version"])
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflict(
                f"catalog version {state['version']} already committed "
                "by a concurrent writer"
            )
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = os.path.join(
            self.meta_dir, f"CURRENT.tmp.{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w") as f:
            f.write(str(state["version"]))
        os.replace(tmp, os.path.join(self.meta_dir, "CURRENT"))

    def _commit(self, mutate) -> dict:
        """CAS-retry loop: ``mutate(tables_dict)`` edits the mapping in
        place (raising for domain errors); retried on conflict against
        the fresh state."""
        while True:
            st = self.state()
            tables = dict(st["tables"])
            mutate(tables)
            new = {
                "version": st["version"] + 1,
                "tables": tables,
                "committed_at": time.time(),
            }
            try:
                self._write_state(new)
                return new
            except CommitConflict:
                continue

    # ------------------------------------------------------ operations

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        key_cols: list[str],
        **kwargs,
    ) -> MiniLakeTable:
        """Create and register a table. The physical root is a fresh
        uuid dir — the identifier is pure catalog metadata."""
        ns, tbl = _valid_ident(name)
        ident = f"{ns}.{tbl}"
        root = os.path.join(self.tables_dir, uuid.uuid4().hex)
        table = MiniLakeTable.create(
            self.spark, root, schema, key_cols=key_cols, **kwargs
        )

        def mutate(tables):
            if ident in tables:
                raise ValueError(f"table {ident!r} already exists")
            tables[ident] = root

        try:
            self._commit(mutate)
        except ValueError:
            shutil.rmtree(root, ignore_errors=True)  # lost the race
            raise
        return table

    def load_table(self, name: str) -> MiniLakeTable:
        ns, tbl = _valid_ident(name)
        ident = f"{ns}.{tbl}"
        root = self.state()["tables"].get(ident)
        if root is None:
            raise KeyError(f"no table {ident!r} in the catalog")
        return MiniLakeTable(self.spark, root)

    def table_exists(self, name: str) -> bool:
        ns, tbl = _valid_ident(name)
        return f"{ns}.{tbl}" in self.state()["tables"]

    def list_tables(self, namespace: str | None = None) -> list[str]:
        idents = sorted(self.state()["tables"])
        if namespace is None:
            return idents
        return [i for i in idents if i.split(".", 1)[0] == namespace]

    def list_namespaces(self) -> list[str]:
        return sorted(
            {i.split(".", 1)[0] for i in self.state()["tables"]}
        )

    def rename_table(self, old: str, new: str) -> None:
        """Atomic rename — ONE catalog commit moving the pointer; the
        physical root (and every absolute path inside the table's own
        manifests) is untouched, so open readers keep working and a
        crash can never leave a half-renamed table."""
        ons, otbl = _valid_ident(old)
        nns, ntbl = _valid_ident(new)
        oident, nident = f"{ons}.{otbl}", f"{nns}.{ntbl}"

        def mutate(tables):
            if oident not in tables:
                raise KeyError(f"no table {oident!r} in the catalog")
            if nident == oident:
                return  # self-rename: idempotent no-op (HMS semantics)
            if nident in tables:
                raise ValueError(f"table {nident!r} already exists")
            tables[nident] = tables.pop(oident)

        self._commit(mutate)

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Unregister a table. ``purge=True`` also deletes the physical
        root (Iceberg ``DROP TABLE ... PURGE``); without it the data
        stays on disk for out-of-band recovery — re-registering is a
        :meth:`register_table` away."""
        ns, tbl = _valid_ident(name)
        ident = f"{ns}.{tbl}"
        holder: dict = {}

        def mutate(tables):
            if ident not in tables:
                raise KeyError(f"no table {ident!r} in the catalog")
            holder["root"] = tables.pop(ident)

        self._commit(mutate)
        if purge:
            shutil.rmtree(holder["root"], ignore_errors=True)

    def register_table(self, name: str, root: str) -> None:
        """Adopt an existing table root under a catalog identifier (the
        recovery path for a purge-less drop, and the import path for a
        table created outside the catalog)."""
        ns, tbl = _valid_ident(name)
        ident = f"{ns}.{tbl}"
        if not MiniLakeTable.exists(root):
            raise ValueError(f"no MiniLake table at {root!r}")

        def mutate(tables):
            if ident in tables:
                raise ValueError(f"table {ident!r} already exists")
            tables[ident] = root

        self._commit(mutate)

    def transaction(self, txn_id: str | None = None):
        """Begin a multi-table atomic transaction (see
        :mod:`.transaction`): ``with cat.transaction() as txn:
        txn.merge("ns.table", batch, batch_id=...)`` — commits every
        participant atomically on block exit, aborts on exception."""
        from .transaction import LakeTransaction

        return LakeTransaction(self, txn_id).begin()

    def recover_transactions(self) -> dict:
        """Resolve pending multi-table transactions (startup recovery):
        prepared → aborted, committed → rolled forward."""
        from .transaction import recover_transactions

        return recover_transactions(self)

    def audit_all(self, level: str = "metadata") -> dict:
        """Run the integrity audit over every registered table. Returns
        ``{ident: report}``; ``ok`` is the conjunction."""
        from .audit import audit_table

        reports = {
            ident: audit_table(self.load_table(ident), level=level)
            for ident in self.list_tables()
        }
        return {
            "ok": all(r["ok"] for r in reports.values()),
            "tables": reports,
        }
