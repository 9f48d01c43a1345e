"""Incremental materialized-view maintenance over the change feed.

A keyed aggregate view (e.g. per-conversation stats) is kept current by
PARTIAL RECOMPUTE: each refresh reads only the source versions since the
last refresh, finds the affected keys, recomputes their aggregates from
the source buckets those keys live in, and MERGEs the results into the
view table — O(touched keys' buckets) per refresh, never O(source
table). Keys whose live rows all disappeared (fully deleted) are
tombstoned in the view.

The view's exactly-once fence doubles as the refresh WATERMARK: stream
``mv:<source-root>``'s batch-id high-water is the last source version
folded in, so refreshes are idempotent (a replayed refresh is a fenced
skip) and crash-resumable with no side-channel state. The source
version also serves as the view rows' LSN — monotone, so a newer
refresh's rows always win LWW.

Why not pure delta aggregation: the MOR change feed carries per-batch
LWW winners, not before-images, so subtractable aggregates (count/sum
under update/delete) cannot be maintained from deltas alone — partial
recompute is the scalable pattern that stays correct for ANY aggregate.

Reference analog: none (§2.8 gap-fill) — the downstream-consumer
pattern a CDC engine exists to feed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minilake import FENCES_PROP, MergeResult, MiniLakeTable


def _check_view_key(source: MiniLakeTable, view: MiniLakeTable) -> str:
    key = view.manifest()["key_cols"]
    if len(key) != 1 or key[0] != source.manifest()["key_cols"][0]:
        raise ValueError(
            "view key must be exactly the source's primary key column "
            f"(view: {key}, source: {source.manifest()['key_cols']})"
        )
    return key[0]


def refresh_keyed_aggregate(
    source: MiniLakeTable,
    view: MiniLakeTable,
    agg_fn: Callable[[DataFrame], DataFrame],
    to_version: int | None = None,
) -> MergeResult | None:
    """Fold source changes since the last refresh into ``view``.

    ``agg_fn`` maps a DataFrame of live source rows (the affected keys'
    current state) to exactly one row per view key, with columns
    matching the view schema. The view's single key column must equal
    the source's primary key column (bucket pruning derives from it).
    Returns the MERGE result, or None when the view is already current.
    """
    key = _check_view_key(source, view)
    stream_id = f"mv:{source.root}"
    watermark = view.snapshot_props().get(FENCES_PROP, {}).get(stream_id, -1)
    from_version = max(int(watermark), 1)
    to_version = (
        to_version if to_version is not None else source.current_version()
    )
    if to_version <= from_version:
        return None

    m = source.manifest(to_version)
    changes = source.read_changes_since(from_version, to_version)
    changed = changes.select(key).distinct()

    # bucket-prune the recompute: the affected keys' buckets only —
    # an O(n_buckets) driver collect, then a pruned source read
    bvals = sorted(
        r[0]
        for r in changed.select(
            source._bucket_expr(key, m["n_buckets"])
        )
        .distinct()
        .collect()
    )
    dirs = [d for b in bvals for d in m["buckets"].get(str(b), [])]
    affected = source.read(version=to_version, _dirs=dirs).join(
        changed, key, "left_semi"
    )

    fresh = agg_fn(affected)
    payload_cols = [c for c in fresh.columns if c != key]
    upserts = fresh.select(
        key, *payload_cols,
        F.lit(int(to_version)).alias("lsn"), F.lit("U").alias("op"),
    )
    # affected keys with NO surviving live rows: tombstone the view row
    deletes = changed.join(fresh.select(key), key, "left_anti").select(
        key,
        *[F.lit(None).alias(c) for c in payload_cols],
        F.lit(int(to_version)).alias("lsn"),
        F.lit("D").alias("op"),
    )
    return view.merge(
        upserts.unionByName(deletes),
        batch_id=to_version,  # the fence IS the watermark
        stream_id=stream_id,
    )


def reseed_keyed_aggregate(
    source: MiniLakeTable,
    view: MiniLakeTable,
    agg_fn: Callable[[DataFrame], DataFrame],
    to_version: int | None = None,
) -> MergeResult:
    """Full-recompute re-seed: rebuild the ENTIRE view from the source's
    current (or pinned) snapshot and advance the fence-watermark to it.

    This is the documented recovery path when the view's watermark has
    fallen behind the source's retention horizon — ``expire_snapshots``
    dropped the watermark's manifest, so :func:`refresh_keyed_aggregate`
    raises the clear retention ValueError instead of silently missing
    changes. O(source), not O(changes) — one-time; afterwards incremental
    refreshes resume from ``to_version`` via the same fence.

    View keys with no surviving source rows (deleted while the view was
    stale) are tombstoned, so the re-seed converges the view exactly —
    deletes replay as auditable tombstones, not silent absences.
    """
    key = _check_view_key(source, view)
    stream_id = f"mv:{source.root}"
    to_version = (
        to_version if to_version is not None else source.current_version()
    )
    fresh = agg_fn(source.read(version=to_version))
    payload_cols = [c for c in fresh.columns if c != key]
    upserts = fresh.select(
        key, *payload_cols,
        F.lit(int(to_version)).alias("lsn"), F.lit("U").alias("op"),
    )
    stale = view.read().select(key).join(
        fresh.select(key), key, "left_anti"
    ).select(
        key,
        *[F.lit(None).alias(c) for c in payload_cols],
        F.lit(int(to_version)).alias("lsn"),
        F.lit("D").alias("op"),
    )
    return view.merge(
        upserts.unionByName(stale),
        batch_id=to_version,
        stream_id=stream_id,
    )
