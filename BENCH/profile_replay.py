"""Replay-only knob profiler: per-phase wall times at one parallelism
level, for chasing the N→4N scaling gap without full-bench noise.

Usage: python BENCH/profile_replay.py <cpus> [files_per_batch] [max_split_mb]
Prints one JSON line: per-batch wall_ms from lineage, compact time, total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
FILES_PER_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SPLIT_MB = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def main() -> None:
    from etl_pipeline_spark.lake.lineage import LineageLog
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import replay_files

    clog = f"/tmp/etl_bench_changelog_20000000_b5000000"
    assert os.path.exists(os.path.join(clog, "_DONE")), "run bench.py once first"

    spark = get_spark(
        app_name=f"profile-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=min(CPUS, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(SPLIT_MB * 1024 * 1024)
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm
    work = tempfile.mkdtemp(prefix="profile_lake_")
    table = MiniLakeTable.create(
        spark, os.path.join(work, "table"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=32, write_mode="mor",
    )
    t0 = time.time()
    replay_files(
        spark, clog, table, files_per_batch=FILES_PER_BATCH,
        cfg=ApplyConfig(lineage_level="batch"),
    )
    replay_s = time.time() - t0
    t1 = time.time()
    table.compact(drop_tombstones=False)
    compact_s = time.time() - t1
    recs = LineageLog(table.root).records()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "cpus": CPUS, "files_per_batch": FILES_PER_BATCH, "split_mb": SPLIT_MB,
        "replay_s": round(replay_s, 2), "compact_s": round(compact_s, 2),
        "total_s": round(replay_s + compact_s, 2),
        "batch_wall_ms": [r.get("wall_ms") for r in recs],
        "events_per_sec": round(20_000_000 / (replay_s + compact_s), 0),
    }))


if __name__ == "__main__":
    main()
