"""Partial-update merge engine — column-coalescing CDC apply.

The default merge engine (operators/lww.py) treats every change event as
a FULL row image: an update that omits a column nulls it. Real CDC
sources often emit PARTIAL row images (Debezium with
``column.include.list`` filters, wide tables where the binlog carries
only touched columns, Paimon's ``partial-update`` merge engine is built
for exactly this): a null/absent payload column means "not provided —
keep whatever the latest earlier event wrote". This module implements
that engine with delete-reset semantics:

- per key and per payload column, the live value is the one written by
  the highest-LSN event that PROVIDED the column (non-null),
- a delete event RESETS the key: values written at or before the
  delete's LSN can never resurface; a later partial update re-creates
  the key holding only the columns written after the delete,
- the key is live iff any event after its last delete exists; a
  trailing delete is the tombstone (same stale-update fencing as LWW).

The core design point is **associativity**. Per-batch pre-reduce,
read-side resolution, and compaction must all be the SAME fold so that
any grouping of events into batches/files yields the same table
(property-tested against a sequential Python model). A fold of partial
events loses per-event LSNs, so each folded column value carries its own
write LSN in a sibling column (``_vl_<col>``) and the fold keeps, per
key, the max delete LSN (``_reset_lsn``):

    fold(A, B):  reset = max(reset_A, reset_B)
                 per column: the (value, vl) pair with the higher vl,
                 then nulled if vl <= reset        (eager invalidation)

Eager invalidation is safe because resets only grow: a value invalid
against any sub-fold's reset is invalid against the final reset. A raw
event is just a singleton fold (vl = its LSN on provided columns,
reset = its LSN if it is a delete), which is what keeps the physical
layout uniform across delta files, compacted files and in-flight frames.

Physical strategy — scale notes: ONE hash aggregation per fold, the
same shuffle shape as the LWW reduce — map-side partial aggregation
collapses per-key traffic before the exchange, and the merge path folds
inside the delta write's bucket clustering (no extra exchange). Cost is
O(events) with ~2x the column width (the ``_vl_`` siblings are
longs — dictionary/RLE-friendly, cheap on disk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import DELETED_COL, LSN_COL

VL_PREFIX = "_vl_"
RESET_COL = "_reset_lsn"


def vl_col(payload_col: str) -> str:
    """Name of the per-column write-LSN sibling."""
    return VL_PREFIX + payload_col


def partial_event_frame(
    df: DataFrame, payload_cols: list[str]
) -> DataFrame:
    """Lift a cast change batch (keys + payload + ``_lsn`` + ``_deleted``)
    into the fold layout: singleton folds, one per event. Delete rows
    null their payload (a tombstone carries no values) and set
    ``_reset_lsn``; provided (non-null) payload columns get their event's
    LSN as the column write-LSN."""
    alive = ~F.col(DELETED_COL)
    out = df
    for c in payload_cols:
        out = out.withColumn(
            vl_col(c),
            F.when(alive & F.col(c).isNotNull(), F.col(LSN_COL)),
        ).withColumn(c, F.when(alive, F.col(c)))
    return out.withColumn(
        RESET_COL, F.when(~alive, F.col(LSN_COL))
    )


def partial_fold(
    df: DataFrame, keys: list[str], payload_cols: list[str]
) -> DataFrame:
    """Associative fold of partial-update states: one hash aggregation.

    Input and output share the fold layout (keys + payload + ``_vl_*`` +
    ``_reset_lsn`` + ``_lsn`` + ``_deleted``) so folds compose — batch
    pre-reduce, multi-file read resolution and compaction are all this
    function.
    """
    aggs = []
    for c in payload_cols:
        vl = vl_col(c)
        # max over a null-gated (vl, value) struct: rows that did not
        # provide the column contribute a null struct, which aggregation
        # ignores; lexicographic struct ordering with the unique vl
        # first is exactly max_by, measured ~3x faster (same finding as
        # operators/lww.py — MaxBy keeps two buffers and re-evaluates
        # the ordering per row; Max over a struct short-circuits on the
        # first field: the partial bench's compact leg went 11.6s -> on
        # par with lww after this rewrite). Ties (duplicate delivery:
        # same vl) continue into the value, identical by construction.
        # The winner keeps BOTH the value and its write-LSN to re-fold.
        aggs.append(
            F.max(
                F.when(
                    F.col(vl).isNotNull(),
                    F.struct(F.col(vl).alias("l"), F.col(c).alias("v")),
                )
            ).alias(f"_w_{c}")
        )
    aggs.append(F.max(F.col(RESET_COL)).alias(RESET_COL))
    aggs.append(F.max(F.col(LSN_COL)).alias(LSN_COL))
    g = df.groupBy(*keys).agg(*aggs)
    reset = F.coalesce(F.col(RESET_COL), F.lit(-1))
    cols = list(keys)
    for c in payload_cols:
        w = F.col(f"_w_{c}")
        valid = w["l"] > reset  # null l -> null -> when() treats as false
        cols.append(F.when(valid, w["v"]).alias(c))
        cols.append(F.when(valid, w["l"]).alias(vl_col(c)))
    cols.append(F.col(RESET_COL))
    cols.append(F.col(LSN_COL))
    # live iff some event followed the last delete; a trailing delete is
    # the tombstone row (stale-update fencing identical to LWW)
    cols.append(
        F.coalesce(F.col(LSN_COL) == F.col(RESET_COL), F.lit(False)).alias(
            DELETED_COL
        )
    )
    return g.select(*cols)
