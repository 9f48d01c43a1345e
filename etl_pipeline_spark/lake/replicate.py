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

from ..operators.partial_update import RESET_COL, vl_col
from ..schema import DELETED_COL, LSN_COL, physical_name
from .minilake import MiniLakeTable


def _agg_spec_by_logical(table: MiniLakeTable, m: dict) -> dict[str, str]:
    spec = m.get("agg_spec", {})
    return {
        f.name: spec.get(physical_name(f), "last")
        for f in table.schema().fields
        if f.name not in m["key_cols"]
    }


def _decompose_fold_rows(df, key_cols: list[str], payload: list[str]):
    """Partial-engine export: turn fold rows back into the equivalent
    single-column partial change EVENTS — op='U' per provided column at
    its own write-LSN, op='D' at the delete-reset LSN, and an all-null
    keepalive 'U' at the row LSN for liveness. Replaying these through a
    partial-engine replica reconstructs the exact fold (the fold of the
    decomposition IS the row), which keeps replication order-insensitive
    and straggler-correct: a late event that would beat one COLUMN's
    write-LSN on the primary beats it on the replica too — a whole-row
    snapshot image at max-LSN would wrongly fence it.

    Volume: ≤ (payload width + 2) events per fold row — O(changes·width)
    with every projection JVM-side; the union is a no-shuffle plan."""
    types = {f.name: f.dataType for f in df.schema.fields}

    def _sel(lsn_expr, op, provide: str | None):
        return df.select(
            lsn_expr.alias("lsn"),
            F.lit(op).alias("op"),
            *key_cols,
            *[
                (
                    F.col(c) if c == provide else F.lit(None).cast(types[c])
                ).alias(c)
                for c in payload
            ],
        )

    parts = [
        _sel(F.col(vl_col(c)), "U", c).filter(F.col("lsn").isNotNull())
        for c in payload
    ]
    parts.append(
        _sel(F.col(RESET_COL), "D", None).filter(F.col("lsn").isNotNull())
    )
    keepalive = df.filter(~F.col(DELETED_COL))
    parts.append(
        keepalive.select(
            F.col(LSN_COL).alias("lsn"),
            F.lit("U").alias("op"),
            *key_cols,
            *[F.lit(None).cast(types[c]).alias(c) for c in payload],
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _decompose_agg_rows(
    df, key_cols: list[str], spec_by_logical: dict[str, str]
):
    """Agg-engine export: each fold row re-expands into (a) one base
    event carrying its sum/min/max PARTIAL AGGREGATES — re-ingesting a
    partial sum ADDS it, so sums of per-batch partials converge to the
    primary's totals (likewise max/min) — and (b) one single-column
    event per `last` column at its true write-LSN, exactly the partial
    engine's decomposition. Nulls contribute nothing to sum/min/max, so
    the per-`last` events don't disturb the measures."""
    types = {f.name: f.dataType for f in df.schema.fields}
    payload = list(spec_by_logical)
    last_cols = [c for c, fn in spec_by_logical.items() if fn == "last"]

    def _at(lsn_expr):
        # every `last` column whose write-LSN equals this event's LSN
        # rides the SAME event: the replica's exact (key, lsn) dedup
        # then only ever collapses byte-identical events — emitting one
        # event per column would let the dedup eat a sibling column (or
        # a base event's sum contribution) that shares the LSN
        return [
            (
                F.when(F.col(vl_col(c)) == lsn_expr, F.col(c))
                if c in last_cols
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in payload
        ]

    base = df.select(
        F.col(LSN_COL).alias("lsn"),
        F.lit("U").alias("op"),
        *key_cols,
        *[
            (
                F.when(
                    F.col(vl_col(c)) == F.col(LSN_COL), F.col(c)
                ).alias(c)
                if c in last_cols
                else F.col(c).alias(c)
            )
            for c in payload
        ],
    )
    parts = [base]
    for c in last_cols:
        parts.append(
            df.filter(
                F.col(vl_col(c)).isNotNull()
                & (F.col(vl_col(c)) != F.col(LSN_COL))
            ).select(
                F.col(vl_col(c)).alias("lsn"),
                F.lit("U").alias("op"),
                *key_cols,
                *_at(F.col(vl_col(c))),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _write_batch(out, out_dir: str, batch_index: int) -> str | None:
    if out.isEmpty():  # O(first row) probe — no phantom batch files
        return None
    path = os.path.join(out_dir, f"batch-{batch_index:06d}.parquet")
    # one distributed write; .parquet dir reads identically to a file
    out.write.mode("overwrite").parquet(path)
    return path


def _masked_projection(table: MiniLakeTable, cols: list[str]):
    """Column exprs applying the primary's masking policies to a change
    feed — the SANITIZED export: a replica in a less-trusted environment
    ingests masked values as its raw data. Masks compose with CDC
    because they are deterministic and column-local: the same event
    masks identically on every export, nulls stay null (tombstone
    payloads pass through), and a hash-masked KEY pseudonymizes
    consistently, so replica LWW still converges. A ``null`` mask on a
    key column is rejected (it would collapse every key). The ROW
    FILTER deliberately does NOT apply here: a later update failing the
    filter would be dropped from the feed and leave the STALE earlier
    version live on the replica — row-level governance on a replica
    means re-binding the filter there (see tests/test_masking.py)."""
    from ..schema import schema_from_manifest
    from .masking import _mask_expr, masking_policies

    pol = masking_policies(table)
    key_cols = table.manifest()["key_cols"]
    for k in key_cols:
        # only the HASH mask is injective enough for a key: 'null'
        # collapses every key, and 'redact_pii' maps distinct PII-valued
        # keys to one placeholder — either way the replica's LWW fold
        # would silently merge source rows
        if k in pol and pol[k] != "hash":
            raise ValueError(
                f"cannot export with a {pol[k]!r} mask on key column "
                f"{k!r}: non-injective key masks collapse distinct keys "
                "on the replica (use 'hash' to pseudonymize keys)"
            )
    dtypes = {
        f.name: f.dataType
        for f in schema_from_manifest(table.manifest()["schema"]).fields
    }
    from pyspark.sql import types as T

    for c, kind in pol.items():
        if kind == "hash" and not isinstance(dtypes[c], T.StringType):
            # a hash mask rewrites the column to its md5 STRING form —
            # fine for a read view, but an exported changelog must match
            # the replica's declared column type
            raise ValueError(
                f"cannot export a 'hash' mask on non-string column "
                f"{c!r} ({dtypes[c].simpleString()}): the masked value "
                "is a string and would not fit the replica's schema"
            )
    return [
        (
            _mask_expr(c, dtypes[c], pol[c]).alias(c)
            if c in pol
            else F.col(c)
        )
        for c in cols
    ]


def export_changes(
    table: MiniLakeTable,
    out_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    batch_index: int = 0,
    apply_masks: bool = False,
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

    ``apply_masks=True`` (lww engine only) exports the SANITIZED feed:
    the primary's masking policies applied to every change event — the
    replica for the less-trusted environment never receives a raw
    value (see :func:`_masked_projection` for why masks compose with
    CDC and the row filter does not).
    """
    m = table.manifest()
    if apply_masks and m.get("merge_engine", "lww") != "lww":
        raise ValueError(
            "apply_masks is only supported on lww tables: the "
            "partial/agg engines decompose fold state into per-column "
            "events whose masking semantics (masked partial aggregates, "
            "keepalive rows) have no sound definition"
        )
    if from_version is None:
        from_version = 1  # the CREATE snapshot: everything since birth
    changes = table.read_changes_since(from_version, to_version)
    key_cols = m["key_cols"]
    payload = [
        f.name
        for f in table.schema().fields
        if f.name not in key_cols
    ]
    if m.get("merge_engine", "lww") == "partial":
        # fold rows are NOT row images — exporting them as whole-row
        # events would stamp every column with the row's max LSN and
        # mis-fence late per-column stragglers on the replica. Decompose
        # back into single-column partial events instead.
        out = _decompose_fold_rows(changes, key_cols, payload)
    elif m.get("merge_engine", "lww") == "agg":
        # each delta row is the batch's PARTIAL aggregate per key:
        # sums/extrema of partials converge to the primary totals on
        # the replica, `last` columns decompose at their write-LSNs
        out = _decompose_agg_rows(
            changes, key_cols, _agg_spec_by_logical(table, m)
        )
    else:
        cols = (
            _masked_projection(table, key_cols + payload)
            if apply_masks
            else [F.col(c) for c in key_cols + payload]
        )
        out = changes.select(
            F.col(LSN_COL).alias("lsn"),
            F.when(F.col(DELETED_COL), F.lit("D")).otherwise("U").alias("op"),
            *cols,
        )
    return _write_batch(out, out_dir, batch_index)


def export_snapshot(
    table: MiniLakeTable,
    out_dir: str,
    batch_index: int = 0,
    apply_masks: bool = False,
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

    ``apply_masks=True`` re-seeds the SANITIZED replica (same contract
    as :func:`export_changes`; lww engine only).
    """
    m = table.manifest()
    if apply_masks and m.get("merge_engine", "lww") != "lww":
        raise ValueError(
            "apply_masks is only supported on lww tables (see "
            "export_changes)"
        )
    key_cols = m["key_cols"]
    payload = [
        f.name for f in table.schema().fields if f.name not in key_cols
    ]
    phys = table.read_physical()
    if m.get("write_mode", "cow") == "mor":
        phys = table._fold(phys, m)
    if m.get("merge_engine", "lww") == "partial":
        # same decomposition as export_changes: the resolved state's
        # fold rows re-expand into per-column events carrying their TRUE
        # write-LSNs (plus the delete-reset), so a re-seeded replica
        # fences late stragglers exactly as the primary would
        out = _decompose_fold_rows(phys, key_cols, payload)
    elif m.get("merge_engine", "lww") == "agg":
        # the resolved state is ONE total aggregate per key — seeding a
        # FRESH replica with it is exact (each key contributes once)
        out = _decompose_agg_rows(
            phys, key_cols, _agg_spec_by_logical(table, m)
        )
    else:
        cols = (
            _masked_projection(table, key_cols + payload)
            if apply_masks
            else [F.col(c) for c in key_cols + payload]
        )
        out = phys.select(
            F.col(LSN_COL).alias("lsn"),
            F.when(F.col(DELETED_COL), F.lit("D")).otherwise("U").alias("op"),
            *cols,
        )
    return _write_batch(out, out_dir, batch_index)
