"""Shallow clone vs physical re-seed: receipts for the O(1) claim.

``shallow_clone`` is a metadata-only commit (one tag + one manifest
write), whatever the table holds; the physical alternative
(`replicate.export_snapshot` + replaying the export into a fresh table)
is O(table). This bench replays a changelog into a primary and times
both ways of getting a second, independently-writable table, then
checks the clone actually serves the same row count.

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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_CLONE_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_CLONE_BATCHES", "4"))


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.lake.replicate import export_snapshot
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog
    from etl_pipeline_spark.streaming.ingest import replay_files

    spark = get_spark(
        app_name=f"clone-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="clone_bench_")
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
    primary = MiniLakeTable.create(
        spark,
        os.path.join(tmp, "primary"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        n_buckets=16,
        write_mode="mor",
    )
    for i, f in enumerate(files):
        primary.merge(spark.read.parquet(f), batch_id=i)
    rows = primary.read().count()

    t0 = time.time()
    clone = primary.shallow_clone(os.path.join(tmp, "clone"))
    clone_s = time.time() - t0

    t0 = time.time()
    export_dir = os.path.join(tmp, "export")
    export_snapshot(primary, export_dir)
    replica = MiniLakeTable.create(
        spark,
        os.path.join(tmp, "replica"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        n_buckets=16,
        write_mode="mor",
    )
    replay_files(spark, export_dir, replica)
    physical_s = time.time() - t0

    t0 = time.time()
    clone_rows = clone.read().count()
    clone_read_s = time.time() - t0
    assert clone_rows == rows == replica.read().count()

    out = {
        "metric": "shallow_clone_vs_physical_reseed",
        "unit": "sec",
        "events": N_EVENTS,
        "table_rows": rows,
        "shallow_clone_s": round(clone_s, 4),
        "physical_reseed_s": round(physical_s, 3),
        "speedup": round(physical_s / max(clone_s, 1e-9), 1),
        "clone_first_read_s": round(clone_read_s, 3),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
