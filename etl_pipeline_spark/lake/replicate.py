"""Table-to-table replication via the CDC-out surface.

``read_changes_since`` serves the delta rows MERGE commits appended
(per-batch LWW winners INCLUDING tombstones). This module turns that
feed back into a changelog a downstream ``replay_files`` /
``run_ingest_stream`` can ingest — the standard lake-to-lake replication
chain (primary table → change files → replica table), generalizing the
reference's single-hop extract→load into a composable pipeline stage
(reference analog: none; §2.8 gap-fill on the K3 sink family).

Scale shape: the export is ONE distributed write of the delta files —
O(changes), never O(table); tombstones travel as op='D' events so
replica deletes replay exactly; lsn order is preserved per row, and LWW
on the replica makes the transfer order-insensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.lww import lww_reduce
from ..schema import DELETED_COL, LSN_COL
from .minilake import MiniLakeTable


def _write_batch(out, out_dir: str, batch_index: int) -> str | None:
    if out.isEmpty():  # O(first row) probe — no phantom batch files
        return None
    path = os.path.join(out_dir, f"batch-{batch_index:06d}.parquet")
    # one distributed write; .parquet dir reads identically to a file
    out.write.mode("overwrite").parquet(path)
    return path


def export_changes(
    table: MiniLakeTable,
    out_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    batch_index: int = 0,
) -> str | None:
    """Write the changes in ``(from_version, to_version]`` as one ordered
    changelog batch file set (``batch-NNNNNN.parquet`` directory) that
    ``replay_files`` ingests directly.

    ``from_version`` defaults to the initial snapshot (full export);
    incremental callers pass the version their last export reached and
    bump ``batch_index``. Returns the written batch path, or None when
    there are no changes (no empty files — a downstream fence advances
    via its own empty-batch handling, not phantom batches).

    Live rows are emitted as op='U' (idempotent upsert — the replica's
    MERGE treats I and U identically), tombstones as op='D'. The
    source's ``_lsn`` rides along unchanged, so replicas converge to the
    same LWW winners whatever order batches land in.
    """
    m = table.manifest()
    if from_version is None:
        from_version = 1  # the CREATE snapshot: everything since birth
    changes = table.read_changes_since(from_version, to_version)
    key_cols = m["key_cols"]
    payload = [
        f.name
        for f in table.schema().fields
        if f.name not in key_cols
    ]
    out = changes.select(
        F.col(LSN_COL).alias("lsn"),
        F.when(F.col(DELETED_COL), F.lit("D")).otherwise("U").alias("op"),
        *key_cols,
        *payload,
    )
    return _write_batch(out, out_dir, batch_index)


def export_snapshot(
    table: MiniLakeTable,
    out_dir: str,
    batch_index: int = 0,
) -> str | None:
    """Re-seed export: the table's CURRENT resolved state as one
    changelog batch — live rows as op='U', tombstoned keys as op='D',
    each carrying its winning ``_lsn``.

    This is the documented recovery path when ``export_changes``'s
    ``from_version`` has fallen behind the retention horizon (its
    manifest was dropped by ``expire_snapshots`` and the incremental
    read raises a clear ValueError). Because every row keeps the lsn
    that won LWW on the primary, applying a snapshot to a replica that
    already holds SOME prefix of the change stream still converges:
    newer replica rows survive, older ones are overwritten, and deletes
    replay as tombstones rather than silent absences. O(table), not
    O(changes) — use only to (re-)seed, then return to incremental
    exports from the snapshot's version.
    """
    m = table.manifest()
    key_cols = m["key_cols"]
    payload = [
        f.name for f in table.schema().fields if f.name not in key_cols
    ]
    phys = table.read_physical()
    if m.get("write_mode", "cow") == "mor":
        phys = lww_reduce(
            phys,
            keys=key_cols,
            order_col=LSN_COL,
            payload_cols=payload + [DELETED_COL],
        )
    out = phys.select(
        F.col(LSN_COL).alias("lsn"),
        F.when(F.col(DELETED_COL), F.lit("D")).otherwise("U").alias("op"),
        *key_cols,
        *payload,
    )
    return _write_batch(out, out_dir, batch_index)
