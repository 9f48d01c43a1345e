"""Partial-update engine overhead bench: same changelog, lww vs partial.

The partial engine's fold carries a write-LSN sibling per payload column
and a per-key reset LSN (operators/partial_update.py), so its merge
writes wider deltas and its read resolve aggregates more columns. This
run replays the same volume-packed changelog into fresh MOR tables under
both engines with direct per-batch merges and reports, per engine: the
merge wall, the read-resolve wall (read().count()), and the compaction
wall. A third leg replays a MASKED stream (every 3rd update drops one
column — the partial engine's actual workload shape) to show the cost
does not degrade on partial images. Prints one JSON line; record it in
BENCH/BASELINE.md.

Expectation: merge within ~10-20% of lww (the extra columns are longs —
dictionary/RLE-cheap — and the fold is the same single hash
aggregation); resolve similar. The price buys column-coalescing
semantics lww cannot express at any cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (session sizing + sf plumbing)

N_EVENTS = int(os.environ.get("SPARK_GRAFT_PARTIAL_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_PARTIAL_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog

    spark = get_spark(
        app_name=f"partial-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="partial_bench_")
    clog = os.path.join(tmp, "changelog")
    cfg = GenConfig(
        seed=11,
        n_events=N_EVENTS,
        n_conversations=max(N_EVENTS // 400, 1000),
        max_turns=50,
        batch_size=N_EVENTS // BATCHES,
        hot_key_fraction=0.2,
        shuffle_window=1000,
        dup_delivery_rate=0.01,
        dead_letter_rate=0.0,
    )
    write_changelog(cfg, clog)
    files = list_batch_files(clog)

    def fresh_table(name: str, engine: str) -> MiniLakeTable:
        return MiniLakeTable.create(
            spark,
            os.path.join(tmp, name),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            n_buckets=16,
            write_mode="mor",
            merge_engine=engine,
        )

    def mask(df):
        # Debezium-style partial images: every 3rd update omits role,
        # the next omits text — same masking the graded
        # cdc_partial_update_state query uses
        u = F.col("op") == "U"
        return df.withColumn(
            "role",
            F.when(u & (F.col("lsn") % 3 == 0), F.lit(None)).otherwise(
                F.col("role")
            ),
        ).withColumn(
            "text",
            F.when(u & (F.col("lsn") % 3 == 1), F.lit(None)).otherwise(
                F.col("text")
            ),
        )

    def run(name: str, engine: str, masked: bool):
        t = fresh_table(name, engine)
        t0 = time.time()
        for i, f in enumerate(files):
            src = spark.read.parquet(f)
            if masked:
                src = mask(src)
            t.merge(src, batch_id=i)
        merge_wall = time.time() - t0
        t0 = time.time()
        rows = t.read().count()
        resolve_wall = time.time() - t0
        t0 = time.time()
        t.compact(drop_tombstones=False)
        compact_wall = time.time() - t0
        return merge_wall, resolve_wall, compact_wall, rows

    legs = {}
    rows_by_leg = {}
    for leg, engine, masked in [
        ("lww_full", "lww", False),
        ("partial_full", "partial", False),
        ("partial_masked", "partial", True),
    ]:
        runs = [run(f"{leg}-{r}", engine, masked) for r in range(REPS)]
        best = min(runs, key=lambda r: r[0])
        legs[leg] = {
            "merge_s": round(best[0], 3),
            "resolve_s": round(best[1], 3),
            "compact_s": round(best[2], 3),
        }
        rows_by_leg[leg] = best[3]

    out = {
        "metric": "partial_engine_vs_lww_replay",
        "unit": "sec",
        "events": N_EVENTS,
        "batches": BATCHES,
        **{f"{leg}_{k}": v for leg, d in legs.items() for k, v in d.items()},
        "final_rows": rows_by_leg,
        "merge_overhead_ratio": round(
            legs["partial_full"]["merge_s"] / legs["lww_full"]["merge_s"], 3
        ),
        "resolve_overhead_ratio": round(
            legs["partial_full"]["resolve_s"] / legs["lww_full"]["resolve_s"],
            3,
        ),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
