"""Z-order vs linear clustered compaction: layout cost and pruning payoff.

``compact(cluster_cols=[a, b], zorder=True)`` buys multi-dimensional
file pruning: every clustered dimension's :meth:`read_range` plans a
subset of files from manifest bounds, where linear clustering serves
only the leading dimension. This bench replays one changelog into a
MiniLake table, then compacts two copies — linear ``(ts, turn_idx)``
and z-order ``(ts, turn_idx)`` — and reports, per layout:

- ``compact_s``: the rewrite wall (z-order adds one min/max agg pass
  and the bit-interleave expression to the same shuffle + sort).
- ``dim1/dim2_files``: files planned / total for a narrow ts band
  (leading dimension) and a turn_idx band (second dimension) — the
  driver-side metadata decision a 10^10-row deployment cares about.
- ``dim2_scan_s``: wall of counting the second-dimension band through
  ``read_range`` (pruned scan + exact filter).

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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_ZORDER_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_ZORDER_BATCHES", "4"))
TARGET_ROWS = int(os.environ.get("SPARK_GRAFT_ZORDER_TARGET", "20000"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog

    spark = get_spark(
        app_name=f"zorder-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="zorder_bench_")
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
    primary.set_stats_columns(["ts", "turn_idx"])
    b = primary.read().agg(
        F.min(F.unix_timestamp("ts")).alias("mn"),
        F.max(F.unix_timestamp("ts")).alias("mx"),
        F.max("turn_idx").alias("tmax"),
    ).first()
    span = int(b.mx) - int(b.mn)
    import datetime

    ts_lo = datetime.datetime.utcfromtimestamp(int(b.mn) + span // 4)
    ts_hi = datetime.datetime.utcfromtimestamp(int(b.mn) + span // 4 + span // 8)
    ti_lo, ti_hi = int(b.tmax) // 4, int(b.tmax) // 2

    def run(name: str, zorder: bool):
        root = os.path.join(tmp, name)
        shutil.copytree(primary.root, root)
        t = MiniLakeTable(spark, root)
        t0 = time.time()
        t.compact(
            drop_tombstones=True,
            cluster_cols=["ts", "turn_idx"],
            zorder=zorder,
            target_rows_per_file=TARGET_ROWS,
        )
        compact_s = time.time() - t0
        p1 = t.plan_range_scan("ts", ts_lo, ts_hi)
        p2 = t.plan_range_scan("turn_idx", ti_lo, ti_hi)
        assert p1["mode"] == "file" and p2["mode"] == "file", (p1, p2)
        t0 = time.time()
        rows = t.read_range("turn_idx", ti_lo, ti_hi).count()
        dim2_scan_s = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return {
            "compact_s": round(compact_s, 3),
            "dim1_files": [p1["files_planned"], p1["files_total"]],
            "dim2_files": [p2["files_planned"], p2["files_total"]],
            "dim2_scan_s": round(dim2_scan_s, 3),
            "dim2_rows": rows,
        }

    legs = {}
    for leg, z in [("linear", False), ("zorder", True)]:
        runs = [run(f"{leg}-{r}", z) for r in range(REPS)]
        legs[leg] = min(runs, key=lambda r: r["compact_s"])

    assert legs["zorder"]["dim2_rows"] == legs["linear"]["dim2_rows"]
    out = {
        "metric": "zorder_vs_linear_clustering",
        "unit": "sec",
        "events": N_EVENTS,
        "target_rows_per_file": TARGET_ROWS,
        **{f"{leg}_{k}": v for leg, d in legs.items() for k, v in d.items()},
        "compact_overhead_ratio": round(
            legs["zorder"]["compact_s"] / legs["linear"]["compact_s"], 3
        ),
        "dim2_files_ratio": round(
            legs["zorder"]["dim2_files"][0]
            / max(legs["linear"]["dim2_files"][0], 1),
            3,
        ),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
