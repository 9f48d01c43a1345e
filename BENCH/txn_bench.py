"""Multi-table transaction overhead bench: one-stream fan-out to two
tables through catalog.transaction() vs the same merges committed
independently.

The txn path (lake/transaction.py) adds, per batch: two txn-record
writes + the commit-point rename (driver-side fsyncs) and routes both
merges through WAP stage + metadata-only publish instead of a direct
commit. The data jobs are identical, so the measured delta is the
price of atomicity. Prints one JSON line; record it in
BENCH/BASELINE.md.

Expectation: same class as the WAP bench's machinery overhead —
single-digit percent at bench batch sizes, amortizing as batches grow,
because nothing data-sized moves differently.
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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_TXN_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_TXN_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_pipeline_spark.lake.catalog import MiniLakeCatalog
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog

    spark = get_spark(
        app_name=f"txn-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="txn_bench_")
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

    stats_schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), True),
    ])

    def fresh_cat(name: str) -> MiniLakeCatalog:
        cat = MiniLakeCatalog.create(spark, os.path.join(tmp, name))
        cat.create_table(
            "prod.transcripts", TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=16,
            write_mode="mor",
        )
        cat.create_table(
            "prod.conv_stats", stats_schema, key_cols=["conv_id"],
            n_buckets=8, write_mode="mor", merge_engine="agg",
            agg_spec={"n_events": "sum"},
        )
        return cat

    def measures(src):
        return src.filter(F.col("op") != "D").select(
            "lsn", "op", "conv_id",
            F.lit(1).cast("long").alias("n_events"),
        )

    def run_independent(rep: int) -> float:
        cat = fresh_cat(f"ind-{rep}")
        t1 = cat.load_table("prod.transcripts")
        t2 = cat.load_table("prod.conv_stats")
        t0 = time.time()
        for i, f in enumerate(files):
            src = spark.read.parquet(f)
            t1.merge(src, batch_id=i)
            t2.merge(measures(src), batch_id=i)
        return time.time() - t0

    def run_txn(rep: int) -> float:
        cat = fresh_cat(f"txn-{rep}")
        t0 = time.time()
        for i, f in enumerate(files):
            src = spark.read.parquet(f)
            with cat.transaction(txn_id=f"b{i:04d}") as txn:
                txn.merge("prod.transcripts", src, batch_id=i)
                txn.merge("prod.conv_stats", measures(src), batch_id=i)
        return time.time() - t0

    # mirror-ordered reps (A B … B A): the first run of the process is
    # systematically slower (page cache, JIT) — a one-sided order showed
    # ±8% phantom deltas on this host, flipping sign with the order
    ind_runs, txn_runs = [], []
    for r in range(REPS):
        if r % 2 == 0:
            ind_runs.append(run_independent(r))
            txn_runs.append(run_txn(r))
        else:
            txn_runs.append(run_txn(r))
            ind_runs.append(run_independent(r))
    independent = min(ind_runs)
    txn = min(txn_runs)
    out = {
        "metric": "txn_fanout_vs_independent_merges",
        "unit": "sec",
        "events": N_EVENTS,
        "batches": BATCHES,
        "tables": 2,
        "independent_s": round(independent, 3),
        "txn_s": round(txn, 3),
        "atomicity_overhead_ratio": round(txn / independent, 3),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
