"""Branch detour bench: write-to-branch + fast-forward vs direct merge.

Branch refs (merge(to_branch=...) → read(branch=...) audit →
fast_forward) claim the same cost shape as WAP: the delta-write job
runs once at branch-write time and every published commit is a
metadata-only CAS. This run replays the same volume-packed changelog
twice into fresh MOR tables — once with direct merges, once writing
every batch to one branch and fast-forwarding at the end (with one
whole-branch audit count, the realistic gate for a multi-batch
backfill) — and reports the per-path wall, the fast-forward-only wall,
and the overhead ratio. Prints one JSON line; record it in
BENCH/BASELINE.md.

Expectation: machinery overhead ≈ one commit-slot fsync per batch plus
one manifest CAS per commit at publish — single-digit percent, same as
the WAP detour, but amortized over the WHOLE branch rather than paid
per batch-publish round-trip.
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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_BRANCH_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_BRANCH_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog

    spark = get_spark(
        app_name=f"branch-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="branch_bench_")
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

    def fresh_table(name: str) -> MiniLakeTable:
        return MiniLakeTable.create(
            spark,
            os.path.join(tmp, name),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            n_buckets=16,
            write_mode="mor",
        )

    def run_direct(rep: int) -> float:
        t = fresh_table(f"direct-{rep}")
        t0 = time.time()
        for i, f in enumerate(files):
            t.merge(spark.read.parquet(f), batch_id=i)
        return time.time() - t0

    def run_branch(rep: int) -> tuple[float, float, float]:
        t = fresh_table(f"branch-{rep}")
        t0 = time.time()
        t.create_branch("backfill")
        for i, f in enumerate(files):
            t.merge(
                spark.read.parquet(f), batch_id=i, to_branch="backfill"
            )
        # the audit gate a real backfill runs ONCE over the whole
        # branch (vs WAP's per-batch gate) — reported separately so the
        # machinery overhead (branch slots + publish CASes) stands alone
        a0 = time.time()
        t.read(branch="backfill").count()
        audit_wall = time.time() - a0
        p0 = time.time()
        results = t.fast_forward("backfill")
        publish_wall = time.time() - p0
        assert len(results) == len(files)
        return time.time() - t0, audit_wall, publish_wall

    direct = min(run_direct(r) for r in range(REPS))
    branch_runs = [run_branch(r) for r in range(REPS)]
    total, audit, publish = min(branch_runs, key=lambda r: r[0])
    machinery = total - audit
    out = {
        "metric": "branch_write_fastforward_vs_direct_merge",
        "unit": "sec",
        "events": N_EVENTS,
        "batches": BATCHES,
        "direct_merge_s": round(direct, 3),
        "branch_total_s": round(total, 3),
        "audit_query_s": round(audit, 3),
        "fast_forward_s": round(publish, 3),
        "machinery_s": round(machinery, 3),
        "machinery_overhead_ratio": round(machinery / direct, 3),
        "total_overhead_ratio": round(total / direct, 3),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
