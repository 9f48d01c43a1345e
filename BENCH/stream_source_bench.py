"""Streaming table source vs batch CDC export: the Arrow-path tax.

``spark.readStream.format("minilake_changes")`` serves the change feed
through Python workers (pyarrow scans yielding Arrow record batches),
where the batch API (`read_changes_since(...).write.parquet`) stays
entirely JVM-side. This bench drains the SAME full feed both ways into
a parquet sink and reports both walls — the honest cost of the
streaming interop surface. The stream is the right tool when the
consumer needs Spark-checkpointed exactly-once tailing (a live
downstream pipeline); bulk backfills should use the batch export. Each
micro-batch is O(changes in the version span) either way.

Prints one JSON line; record it in BENCH/BASELINE.md.
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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_STREAM_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog
    from etl_pipeline_spark.streaming.table_source import register

    spark = get_spark(
        app_name=f"stream-src-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    register(spark)
    tmp = tempfile.mkdtemp(prefix="stream_src_bench_")
    clog = os.path.join(tmp, "changelog")
    cfg = GenConfig(
        seed=13,
        n_events=N_EVENTS,
        n_conversations=max(N_EVENTS // 400, 1000),
        max_turns=50,
        batch_size=N_EVENTS // BATCHES,
        hot_key_fraction=0.2,
        shuffle_window=1000,
        dup_delivery_rate=0.0,
        dead_letter_rate=0.0,
    )
    write_changelog(cfg, clog)
    files = list_batch_files(clog)
    table = MiniLakeTable.create(
        spark,
        os.path.join(tmp, "table"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        n_buckets=16,
        write_mode="mor",
    )
    for i, f in enumerate(files):
        table.merge(spark.read.parquet(f), batch_id=i)

    def run_stream(r: int) -> tuple[float, int]:
        out = os.path.join(tmp, f"stream-{r}")
        t0 = time.time()
        q = (
            spark.readStream.format("minilake_changes")
            .option("path", table.root)
            .load()
            .writeStream.format("parquet")
            .option("path", os.path.join(out, "data"))
            .option("checkpointLocation", os.path.join(out, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.time() - t0
        rows = spark.read.parquet(os.path.join(out, "data")).count()
        shutil.rmtree(out, ignore_errors=True)
        return wall, rows

    def run_batch(r: int) -> tuple[float, int]:
        out = os.path.join(tmp, f"batch-{r}")
        t0 = time.time()
        table.read_changes_since(1).write.parquet(out)
        wall = time.time() - t0
        rows = spark.read.parquet(out).count()
        shutil.rmtree(out, ignore_errors=True)
        return wall, rows

    stream = min((run_stream(r) for r in range(REPS)), key=lambda x: x[0])
    batch = min((run_batch(r) for r in range(REPS)), key=lambda x: x[0])
    assert stream[1] == batch[1], (stream, batch)
    out = {
        "metric": "stream_source_vs_batch_cdc_export",
        "unit": "sec",
        "events": N_EVENTS,
        "batches": BATCHES,
        "feed_rows": stream[1],
        "stream_drain_s": round(stream[0], 3),
        "batch_export_s": round(batch[0], 3),
        "stream_overhead_ratio": round(stream[0] / batch[0], 3),
        "stream_rows_per_sec": round(stream[1] / stream[0], 1),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
