"""WAP overhead bench: stage+publish vs direct merge, same batches.

Write-audit-publish (merge(stage_to=...) → read_staged audit →
publish_staged) claims the audit gate costs no extra DATA jobs: the
delta-write job runs once at stage time and publish is a metadata-only
CAS. This run replays the same volume-packed changelog twice into fresh
MOR tables — once with direct merges, once staging then publishing each
batch (with a cheap audit count between, the realistic gate) — and
reports the per-path wall, the publish-only wall, and the overhead
ratio. Prints one JSON line; record it in BENCH/BASELINE.md.

Expectation: overhead ≈ the audit query's own cost plus one manifest
write per batch — single-digit percent at bench batch sizes, and
amortizing toward zero as batches grow (the data job dominates).
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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_WAP_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_WAP_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog

    spark = get_spark(
        app_name=f"wap-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="wap_bench_")
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
        # raw merge per batch — the exact same call the WAP path makes,
        # minus the detour, so the ratio isolates stage+audit+publish
        t = fresh_table(f"direct-{rep}")
        t0 = time.time()
        for i, f in enumerate(files):
            t.merge(spark.read.parquet(f), batch_id=i)
        return time.time() - t0

    def run_wap(rep: int) -> tuple[float, float, float]:
        t = fresh_table(f"wap-{rep}")
        t0 = time.time()
        audit_wall = 0.0
        publish_wall = 0.0
        for i, f in enumerate(files):
            src = spark.read.parquet(f)
            t.merge(src, batch_id=i, stage_to=f"gate-{i}")
            # the audit gate a real deployment runs: read the pending
            # state. Its cost is the gate QUERY's, not the WAP
            # machinery's — reported separately so the machinery
            # overhead (stage vs merge + publish CAS) stands alone.
            a0 = time.time()
            t.read_staged(f"gate-{i}").count()
            audit_wall += time.time() - a0
            p0 = time.time()
            t.publish_staged(f"gate-{i}")
            publish_wall += time.time() - p0
        return time.time() - t0, audit_wall, publish_wall

    direct = min(run_direct(r) for r in range(REPS))
    wap_runs = [run_wap(r) for r in range(REPS)]
    wap, audit, publish = min(wap_runs, key=lambda r: r[0])
    machinery = wap - audit
    out = {
        "metric": "wap_stage_publish_vs_direct_merge",
        "unit": "sec",
        "events": N_EVENTS,
        "batches": BATCHES,
        "direct_merge_s": round(direct, 3),
        "wap_total_s": round(wap, 3),
        "audit_query_s": round(audit, 3),
        "publish_only_s": round(publish, 3),
        "machinery_s": round(machinery, 3),
        "machinery_overhead_ratio": round(machinery / direct, 3),
        "total_overhead_ratio": round(wap / direct, 3),
        "cpus_used": bench.USED_CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
