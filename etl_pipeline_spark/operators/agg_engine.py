"""Aggregation merge engine — in-table incremental aggregates.

Third merge engine beside whole-row LWW (operators/lww.py) and
column-coalescing partial updates (operators/partial_update.py), modeled
on Paimon's ``aggregation`` merge engine: each payload column declares
an aggregation function and a MERGE folds new events INTO the stored
per-key aggregate instead of replacing it — a metrics table (per-entity
counters, running extrema, latest attribute) maintained by the ingest
path itself, no separate materialized view required.

Supported per-column functions:

- ``sum``   — running total (nulls contribute nothing),
- ``min`` / ``max`` — running extrema,
- ``last``  — latest provided value by LSN (the partial engine's pick:
  a null-gated ``max(struct(write_lsn, value))`` with a ``_vl_<col>``
  sibling persisting the write-LSN so folds re-fold).

Limitations, stated rather than papered over:

- **No retraction.** A ``sum`` folded from events cannot un-count an
  event, so op='D' is REJECTED at merge time (same stance as Paimon,
  whose aggregation tables restrict retraction inputs). Model deletes
  as compensating events (+x then -x) if the measure supports them.
- **Duplicate delivery within a batch is deduplicated** (exact
  ``(key, lsn)`` collapse before the fold — one extra hash aggregation
  that reuses the delta write's bucket clustering, map-side-combined).
  ACROSS batches, exactly-once relies on the engine's batch fencing:
  each lsn must be delivered in exactly one batch lineage, which the
  changelog replay and streaming drivers guarantee.

Associativity: sum/min/max fold trivially (sum of partial sums, max of
partial maxima); ``last`` carries its write-LSN. Stored rows ARE fold
states, so batch pre-reduce, multi-delta read resolution and compaction
remain the one operator, exactly as in the other engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import DELETED_COL, LSN_COL
from .partial_update import vl_col

AGG_FNS = {"sum", "min", "max", "last"}


def validate_agg_spec(spec: dict, payload_phys: list[str]) -> dict:
    """Normalize an agg spec (keyed by PHYSICAL column name — stable
    across renames): unknown columns and functions fail fast; columns
    not mentioned default to ``last``."""
    spec = dict(spec or {})
    unknown = sorted(set(spec) - set(payload_phys))
    if unknown:
        raise ValueError(f"agg_spec names unknown column(s): {unknown}")
    bad = sorted({fn for fn in spec.values() if fn not in AGG_FNS})
    if bad:
        raise ValueError(
            f"agg_spec has unsupported function(s) {bad}; "
            f"supported: {sorted(AGG_FNS)}"
        )
    return {c: spec.get(c, "last") for c in payload_phys}


def agg_event_frame(df: DataFrame, last_cols: list[str]) -> DataFrame:
    """Lift a cast change batch into the agg fold layout: ``last``
    columns get their write-LSN sibling; sum/min/max columns are used
    as-is (a raw event is the singleton aggregate of itself)."""
    out = df
    for c in last_cols:
        out = out.withColumn(
            vl_col(c),
            F.when(F.col(c).isNotNull(), F.col(LSN_COL)),
        )
    return out


def agg_fold(
    df: DataFrame,
    keys: list[str],
    spec_by_logical: dict[str, str],
) -> DataFrame:
    """One hash aggregation folding per-key aggregate states (raw events
    are singleton states). Input and output share the layout."""
    aggs = []
    post = list(keys)
    for c, fn in spec_by_logical.items():
        if fn == "last":
            aggs.append(
                F.max(
                    F.when(
                        F.col(vl_col(c)).isNotNull(),
                        F.struct(
                            F.col(vl_col(c)).alias("l"), F.col(c).alias("v")
                        ),
                    )
                ).alias(f"_w_{c}")
            )
            post.append(F.col(f"_w_{c}")["v"].alias(c))
            post.append(F.col(f"_w_{c}")["l"].alias(vl_col(c)))
        else:
            aggs.append(getattr(F, fn)(F.col(c)).alias(c))
            post.append(F.col(c))
    aggs.append(F.max(F.col(LSN_COL)).alias(LSN_COL))
    post.append(F.col(LSN_COL))
    post.append(F.lit(False).alias(DELETED_COL))  # no retraction: no stones
    return df.groupBy(*keys).agg(*aggs).select(*post)
