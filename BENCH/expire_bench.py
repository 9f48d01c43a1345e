"""Benchmark row retention expiry (r5: lake/minilake.expire_rows).

The claim: a TTL sweep on a ts-clustered table costs O(boundary files),
not an O(table) rewrite. Measured at the bench scale factor (default
sf0.1 = 20M events → ~2.2M live rows), same local[N] layout as
bench.py:

1. replay + ts-clustered compaction (setup, reported for context)
2. ``expire_rows("ts", cutoff)``  — the metadata path under test
3. the naive alternative on an identical table: rewrite EVERYTHING
   through a filtered compaction-style job (what an engine without
   file-level pruning must do)

Prints one JSON line with both walls, the drop/link/rewrite counts and
the speedup; record in BENCH/BASELINE.md.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import replay_files

    sf = bench.sf_from_dir(bench.SF_DIR)
    n_events = max(int(bench.EVENTS_PER_SF * sf), 100_000)
    clog = bench.changelog_dir(n_events)  # untimed, cached

    spark = get_spark(
        app_name=f"expirebench-sf{sf}-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    work = tempfile.mkdtemp(prefix="expirebench_")
    cfg = ApplyConfig(lineage_level="batch")

    def build(name: str) -> MiniLakeTable:
        t = MiniLakeTable.create(
            spark, os.path.join(work, name), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=32,
            write_mode="mor",
        )
        replay_files(
            spark, clog, t, files_per_batch=bench.FILES_PER_BATCH,
            cfg=cfg, pipeline_depth=bench.PIPELINE_DEPTH,
        )
        t.set_stats_columns(["ts"])
        # ~70k rows per file: dozens of tight ts-spans per bucket
        t.compact(
            drop_tombstones=True, cluster_cols=["ts"],
            target_rows_per_file=max(2048, n_events // 288),
        )
        return t

    timings: dict[str, float] = {}
    out: dict = {}
    expire_runs, naive_runs = [], []
    for rep in range(REPS):
        t = build(f"exp{rep}")
        # cutoff at the ROW median, not a time fraction: genlog's ts
        # distribution is right-skewed (most rows recent — the organic
        # stream shape), so a time-fraction cutoff expires almost
        # nothing; a TTL that removes half the rows is the sweep whose
        # cost profile matters
        med = t.read().agg(
            F.percentile_approx(F.unix_timestamp("ts"), 0.5)
        ).first()[0]
        cutoff = datetime.datetime.utcfromtimestamp(int(med))
        table_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(t.data_dir)
            for f in fs if f.endswith(".parquet")
        )
        t0 = time.time()
        res = t.expire_rows("ts", cutoff)
        expire_runs.append(round(time.time() - t0, 3))
        out["expire_result"] = res
        out["rows_after"] = t.read().count()
        # bytes the expiry actually WROTE: hardlinked survivors have
        # nlink >= 2, rewritten boundary output has nlink == 1
        new_dirs = {
            d for ds in t.manifest()["buckets"].values() for d in ds
        }
        written = kept_linked = 0
        for d in new_dirs:
            for f in os.listdir(d):
                if not f.endswith(".parquet"):
                    continue
                stt = os.stat(os.path.join(d, f))
                if stt.st_nlink >= 2:
                    kept_linked += stt.st_size
                else:
                    written += stt.st_size
        out["table_bytes_before"] = table_bytes
        out["bytes_rewritten"] = written
        out["bytes_hardlinked"] = kept_linked
        out["rewrite_fraction"] = round(written / max(table_bytes, 1), 4)

        # naive alternative: an identical table must rewrite EVERY file
        # through a filtered job (no file-level classification)
        t2 = build(f"naive{rep}")
        t0 = time.time()
        phys = t2.read_physical().filter(
            F.col("_deleted") | F.col("ts").isNull()
            | ~(F.col("ts") < F.lit(cutoff))
        )
        # same output shape as the boundary rewrite: bucket-partitioned
        naive_out = os.path.join(work, f"naive_out{rep}")
        (
            phys.withColumn(
                "_bucket", t2._bucket_expr("conv_id", 32)
            )
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(naive_out)
        )
        naive_runs.append(round(time.time() - t0, 3))
    timings["expire_rows"] = min(expire_runs)
    timings["naive_full_rewrite"] = min(naive_runs)

    print(json.dumps({
        "metric": "expire_rows_bench",
        "unit": "sec",
        "sf": sf,
        "cdc_events": n_events,
        "timings": timings,
        **out,
        "speedup_vs_naive": round(
            timings["naive_full_rewrite"]
            / max(timings["expire_rows"], 1e-9), 2
        ),
        "cpus_used": bench.USED_CPUS,
        "reps": REPS,
    }))


if __name__ == "__main__":
    main()
