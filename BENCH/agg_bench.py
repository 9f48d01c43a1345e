"""Aggregation-engine bench: in-table metrics vs query-time GROUP BY.

The aggregation merge engine (merge_engine='agg', the Paimon
aggregation-engine analog) folds each batch's measures INTO the stored
per-key aggregate at merge time, so reading the metrics table is a
delta fold, never a full-table GROUP BY. The alternative a deployment
weighs is the classic one: replay into a plain LWW transcript table and
compute the same per-conversation metrics at query time.

This run replays the same volume-packed changelog both ways and reports:

- ``lww``: merge wall into the transcript table, then the wall of ONE
  query-time ``GROUP BY conv_id`` over the resolved state (what every
  metrics read costs without the engine), then compact.
- ``agg``: merge wall of the measure stream into the agg table
  (deletes filtered — aggregation states cannot retract, the engine's
  documented limitation), then the wall of ``read().count()`` (the
  fold IS the aggregation), then compact.

Semantics caveat (documented, not hidden): the two legs compute the
nearest comparable metrics, not identical ones. The agg table's
``n_events`` sums one per EVENT (updates included) — a metric the
collapsed LWW state cannot reconstruct at any cost — while the lww
leg counts live turns and picks the last role by ``turn_idx`` (the
state's own ordering; ``_lsn`` is bookkeeping that ``read()`` hides).
Both produce one row per conversation, which is what the wall-clock
comparison needs.

The point is not that the agg merges are cheaper than lww merges (they
carry one row per EVENT into a table with one row per KEY, same as lww)
— it is that every subsequent metrics READ drops from O(events in
state) aggregation to O(keys) fold, which at a 10^10-event deployment
is the difference between a dashboard query and a batch job. Prints one
JSON line; record it in BENCH/BASELINE.md.
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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_AGG_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_AGG_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog

    spark = get_spark(
        app_name=f"agg-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="agg_bench_")
    clog = os.path.join(tmp, "changelog")
    cfg = GenConfig(
        seed=13,
        n_events=N_EVENTS,
        n_conversations=max(N_EVENTS // 400, 1000),
        max_turns=50,
        batch_size=N_EVENTS // BATCHES,
        # no deletes: the agg engine rejects op='D' by design, and the
        # lww leg must aggregate the same event set to stay comparable
        op_mix=(0.65, 0.35, 0.0),
        hot_key_fraction=0.2,
        shuffle_window=1000,
        dup_delivery_rate=0.0,
        dead_letter_rate=0.0,
    )
    write_changelog(cfg, clog)
    files = list_batch_files(clog)

    metrics_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_events", T.LongType(), True),
            T.StructField("last_role", T.StringType(), True),
            T.StructField("ts_first", T.LongType(), True),
            T.StructField("ts_last", T.LongType(), True),
        ]
    )

    def measures(df):
        return df.select(
            "lsn",
            "op",
            "conv_id",
            F.lit(1).cast("long").alias("n_events"),
            F.col("role").alias("last_role"),
            F.unix_timestamp("ts").alias("ts_first"),
            F.unix_timestamp("ts").alias("ts_last"),
        )

    def run_lww(name: str):
        t = MiniLakeTable.create(
            spark,
            os.path.join(tmp, name),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            n_buckets=16,
            write_mode="mor",
        )
        t0 = time.time()
        for i, f in enumerate(files):
            t.merge(spark.read.parquet(f), batch_id=i)
        merge_wall = time.time() - t0
        t0 = time.time()
        rows = (
            t.read()
            .groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.max_by("role", "turn_idx").alias("last_role"),
                F.min(F.unix_timestamp("ts")).alias("ts_first"),
                F.max(F.unix_timestamp("ts")).alias("ts_last"),
            )
            .count()
        )
        read_wall = time.time() - t0
        t0 = time.time()
        t.compact(drop_tombstones=False)
        compact_wall = time.time() - t0
        return merge_wall, read_wall, compact_wall, rows

    def run_agg(name: str):
        t = MiniLakeTable.create(
            spark,
            os.path.join(tmp, name),
            metrics_schema,
            key_cols=["conv_id"],
            n_buckets=16,
            write_mode="mor",
            merge_engine="agg",
            agg_spec={
                "n_events": "sum",
                "last_role": "last",
                "ts_first": "min",
                "ts_last": "max",
            },
        )
        t0 = time.time()
        for i, f in enumerate(files):
            t.merge(measures(spark.read.parquet(f)), batch_id=i)
        merge_wall = time.time() - t0
        t0 = time.time()
        rows = t.read().count()
        read_wall = time.time() - t0
        t0 = time.time()
        t.compact(drop_tombstones=False)
        compact_wall = time.time() - t0
        return merge_wall, read_wall, compact_wall, rows

    legs = {}
    rows_by_leg = {}
    for leg, fn in [("lww", run_lww), ("agg", run_agg)]:
        runs = [fn(f"{leg}-{r}") for r in range(REPS)]
        best = min(runs, key=lambda r: r[0])
        legs[leg] = {
            "merge_s": round(best[0], 3),
            "metrics_read_s": round(best[1], 3),
            "compact_s": round(best[2], 3),
        }
        rows_by_leg[leg] = best[3]

    out = {
        "metric": "agg_engine_vs_query_time_groupby",
        "unit": "sec",
        "events": N_EVENTS,
        "batches": BATCHES,
        **{f"{leg}_{k}": v for leg, d in legs.items() for k, v in d.items()},
        "final_rows": rows_by_leg,
        "merge_overhead_ratio": round(
            legs["agg"]["merge_s"] / legs["lww"]["merge_s"], 3
        ),
        "metrics_read_speedup": round(
            legs["lww"]["metrics_read_s"] / legs["agg"]["metrics_read_s"], 3
        ),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
