"""The per-micro-batch apply path — validate → clean → evolve → LWW →
MERGE → lineage.

This is the engine's generalization of the reference's
extract→transform→load pass (/root/reference/main.py:228-264), executed
once per micro-batch inside ``foreachBatch`` (or the bounded replay
driver). Stage order mirrors the reference's observable order
(strip → filter → dedup → cast, transform.py:281-297) where it matters.

Scale shape per batch (10^10-event design):
  1 Parquet scan (predicate/column pruned) →
  dead-letter split (no shuffle) →
  cleaning (JVM exprs or Arrow pandas UDF, no per-row Python) →
  LWW hash-agg (shuffle #1, map-side partial, salted two-phase on skew) →
  bucket-pruned MERGE (shuffle #2 confined to touched buckets) →
  atomic snapshot commit (driver) + one lineage record.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.cleaning import clean_text_col, clean_text_pudf
from .lake.lineage import LineageLog
from .lake.minilake import MergeResult, MiniLakeTable
from .operators.lww import detect_hot_keys, lww_reduce, lww_reduce_salted
from .operators.validate import split_valid
from .schema import KEY_COLS


@dataclass
class ApplyConfig:
    key_cols: list[str] = field(default_factory=lambda: list(KEY_COLS))
    lsn_col: str = "lsn"
    op_col: str = "op"
    clean_cols: tuple[str, ...] = ("text",)
    use_pandas_udf: bool = True  # Arrow path (input_hint mandate); False = pure JVM exprs
    salt_on_skew: bool = True
    force_salted: bool = False
    skew_threshold: float = 0.05
    dead_letter_dir: str | None = None  # default: <table_root>/_deadletter
    assert_unique_keys: bool = False


def apply_batch(
    table: MiniLakeTable,
    batch_df: DataFrame,
    batch_id: int,
    cfg: ApplyConfig | None = None,
    lineage: LineageLog | None = None,
    stream_id: str = "default",
) -> MergeResult:
    """Apply one change-event micro-batch exactly once (within the
    ``stream_id`` source lineage; cross-lineage redelivery is made
    harmless by the idempotent LWW merge)."""
    cfg = cfg or ApplyConfig()
    lineage = lineage or LineageLog(table.root)
    t0 = time.time()

    # 0. Fence first — a replayed batch must cost nothing but a manifest read.
    from .lake.minilake import FENCES_PROP

    highwater = table.snapshot_props().get(FENCES_PROP, {}).get(stream_id, -1)
    if batch_id <= highwater:
        res = MergeResult(
            skipped=True,
            version=table.current_version(),
            snapshot_id=table.manifest()["snapshot_id"],
        )
        lineage.append(
            {"batch_id": batch_id, "stream_id": stream_id,
             "skipped_fenced": True, "version": res.version}
        )
        return res

    # 1. Dead-letter split (null keys / unknown op never applied).
    valid, dead = split_valid(batch_df, cfg.key_cols)

    # 2. Vectorized cleaning on the after-image payload.
    cleaner = clean_text_pudf if cfg.use_pandas_udf else clean_text_col
    for c in cfg.clean_cols:
        if c in valid.columns:
            valid = valid.withColumn(c, cleaner(F.col(c)))

    # 3. In-flight additive schema evolution: payload columns the table
    #    doesn't know yet → ALTER TABLE ADD COLUMN before the merge.
    #    Diffed per batch, never cached at stream start (the stream
    #    outlives the schema change — SURVEY.md §7).
    table_cols = {f.name for f in table.schema().fields}
    reserved = {cfg.lsn_col, cfg.op_col, "source_part"}
    batch_payload_fields = [
        f
        for f in batch_df.schema.fields
        if f.name not in table_cols and f.name not in reserved
        and not f.name.startswith("_")
    ]
    if batch_payload_fields:
        table.add_columns(
            [T.StructField(f.name, f.dataType, True) for f in batch_payload_fields]
        )

    # 4. LWW pre-reduce (MERGE-source uniqueness; skew-aware).
    tschema = table.schema()
    types_by_name = {f.name: f.dataType for f in tschema.fields}
    payload_cols = [f.name for f in tschema.fields if f.name not in cfg.key_cols]
    src = valid.select(
        *cfg.key_cols,
        *[
            (
                F.col(c)
                if c in valid.columns
                else F.lit(None).cast(types_by_name[c])
            ).alias(c)
            for c in payload_cols
        ],
        cfg.lsn_col,
        cfg.op_col,
    )
    salted = cfg.force_salted or (
        cfg.salt_on_skew
        and detect_hot_keys(src, cfg.key_cols, cfg.skew_threshold)
    )
    reducer = lww_reduce_salted if salted else lww_reduce
    reduced = reducer(
        src,
        keys=cfg.key_cols,
        order_col=cfg.lsn_col,
        payload_cols=payload_cols + [cfg.op_col],
    )

    # 5. Counters — one pass over the raw batch (cheap aggregates, no
    #    second scan of the cleaned/deduped lineage stages).
    counts = batch_df.agg(
        F.count(F.lit(1)).alias("events_in"),
        F.min(cfg.lsn_col).alias("lsn_min"),
        F.max(cfg.lsn_col).alias("lsn_max"),
        F.sum(F.when(F.col(cfg.op_col) == "I", 1).otherwise(0)).alias("n_i"),
        F.sum(F.when(F.col(cfg.op_col) == "U", 1).otherwise(0)).alias("n_u"),
        F.sum(F.when(F.col(cfg.op_col) == "D", 1).otherwise(0)).alias("n_d"),
    ).collect()[0]

    part_ranges = []
    if "source_part" in batch_df.columns:
        part_ranges = [
            r.asDict()
            for r in batch_df.groupBy("source_part")
            .agg(
                F.min(cfg.lsn_col).alias("lsn_min"),
                F.max(cfg.lsn_col).alias("lsn_max"),
                F.count(F.lit(1)).alias("events"),
            )
            .collect()
        ]

    dl_dir = cfg.dead_letter_dir or os.path.join(table.root, "_deadletter")
    dead_cached = dead.cache()
    dead_count = dead_cached.count()
    if dead_count:
        dead_cached.write.mode("append").parquet(
            os.path.join(dl_dir, f"batch-{batch_id:06d}")
        )
    dead_cached.unpersist()

    # 6. MERGE (atomic snapshot commit, fenced).
    res = table.merge(
        reduced,
        batch_id=batch_id,
        stream_id=stream_id,
        lsn_col=cfg.lsn_col,
        op_col=cfg.op_col,
        assert_unique_keys=cfg.assert_unique_keys,
    )

    wall = time.time() - t0
    events_in = int(counts["events_in"] or 0)
    lineage.append(
        {
            "batch_id": batch_id,
            "stream_id": stream_id,
            "skipped_fenced": res.skipped,
            "events_in": events_in,
            "dead_lettered": dead_count,
            "applied": {
                "I": int(counts["n_i"] or 0),
                "U": int(counts["n_u"] or 0),
                "D": int(counts["n_d"] or 0),
            },
            "offset_range": {
                "lsn_min": int(counts["lsn_min"]) if counts["lsn_min"] is not None else None,
                "lsn_max": int(counts["lsn_max"]) if counts["lsn_max"] is not None else None,
            },
            "source_partitions": part_ranges,
            "salted_reduce": bool(salted),
            "buckets_touched": res.buckets_touched,
            "commit_version": res.version,
            "commit_snapshot_id": res.snapshot_id,
            "wall_ms": round(wall * 1000, 2),
            "events_per_sec": round(events_in / wall, 1) if wall > 0 else None,
        }
    )
    res.wall_ms = wall * 1000
    return res
