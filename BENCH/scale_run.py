"""Scale-up evidence run: one 200M-event replay (10× the sf0.1 bench
volume — the closest in-sandbox proxy for the 10^10-event claim).

Reports sustained events/sec, per-batch throughput stability, partial-
compaction activity, and the delta-chain length distribution from the
final manifest (bounded chains = the amortized-maintenance design doing
its job at scale).

Usage:  python BENCH/scale_run.py [n_events] [cpus] [depth] [events_per_batch]
Writes one JSON line to stdout; progress to stderr.
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

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 2
EPB = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
# input-split sizing: a 5M-event changelog file is ~165 MB, so the old
# fixed 16 MB split yields ~11 scan tasks — an uneven single wave on 16
# cores (5 idle) while local[4] packs 3 full waves. The scan stage then
# caps N→4N scaling regardless of the engine. Default 4 MB ≈ 42 splits
# ≈ 2.6 even waves at 16 cores; overridable per probe.
SPLIT_MB = int(os.environ.get("SCALE_RUN_SPLIT_MB", "4"))


def main() -> None:
    import bench
    from etl_pipeline_spark.lake.lineage import LineageLog
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import replay_files

    clog = bench.changelog_dir(N_EVENTS)  # cached, untimed
    print(f"changelog ready: {clog}", file=sys.stderr)

    spark = get_spark(
        app_name=f"scale-run-{N_EVENTS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(SPLIT_MB * 1024 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    # SCALE_RUN_TMPFS=1 puts the lake (delta writes + compaction folds)
    # on /dev/shm. Rationale, measured in windows 2026-08-18-r5c/r5d:
    # this sandbox has ONE disk shared by every thread, so at local[16]
    # the replay's write side saturates it while local[4] stays
    # CPU-bound — the N→4N ratio then measures the missing 3 disks, not
    # the engine (a real 4x cluster brings 4x spindles). tmpfs removes
    # the single-disk artifact; the changelog READ side stays on disk
    # (page-cached), and the config is identical at both levels and
    # recorded in the draw ("lake_fs").
    tmpfs = os.environ.get("SCALE_RUN_TMPFS", "") == "1" and os.path.isdir("/dev/shm")
    work = tempfile.mkdtemp(
        prefix="scale_lake_", dir="/dev/shm" if tmpfs else None
    )
    table = MiniLakeTable.create(
        spark, os.path.join(work, "table"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=32, write_mode="mor",
    )
    t0 = time.time()
    replay_files(
        spark, clog, table, events_per_batch=EPB,
        cfg=ApplyConfig(lineage_level="batch"), pipeline_depth=DEPTH,
    )
    replay_s = time.time() - t0
    v_pre_final = table.current_version()
    tc = time.time()
    table.compact(drop_tombstones=False)
    compact_s = time.time() - tc
    final_rows = table.read().count()

    # evidence: delta chains stayed bounded DURING the replay — read the
    # pre-final-compaction manifest (version before the fold)
    pre = table.manifest(v_pre_final)
    chain_lens = sorted(len(v) for v in pre["buckets"].values())
    recs = [r for r in LineageLog(table.root).records()
            if not r.get("skipped_fenced") and r.get("events_in")]
    per_batch_eps = [r["events_per_sec"] for r in recs if r.get("events_per_sec")]
    # pipelined replay folds via maintenance DRAINS (direct maybe_compact
    # commits, not apply_batch ones) — count them as the non-merge,
    # non-create snapshots in the history
    compactions = v_pre_final - 1 - len(recs)

    shutil.rmtree(work, ignore_errors=True)
    result = {
        "metric": "scale_run_cdc_apply_throughput",
        "n_events": N_EVENTS,
        # efficiency RATIOS are only meaningful between draws from the
        # same host window on this 3x-variance VM — stamp the day so
        # scaling.py pairs N and 4N draws within a window
        "host_window": os.environ.get(
            "SCALE_RUN_WINDOW", time.strftime("%Y-%m-%d")
        ),
        "cpus": CPUS,
        "lake_fs": "tmpfs" if tmpfs else "disk",
        "split_mb": SPLIT_MB,
        "pipeline_depth": DEPTH,
        "events_per_batch": EPB,
        "replay_s": round(replay_s, 2),
        "events_per_sec": round(N_EVENTS / replay_s, 1),
        "final_compact_s": round(compact_s, 2),
        "final_rows": final_rows,
        "batches": len(recs),
        "mid_replay_compactions": compactions,
        "delta_chain_len_pre_final_fold": {
            "min": chain_lens[0], "max": chain_lens[-1],
            "median": chain_lens[len(chain_lens) // 2],
        },
        "per_batch_events_per_sec_min_max": [
            round(min(per_batch_eps), 1), round(max(per_batch_eps), 1),
        ] if per_batch_eps else None,
    }
    # append to the evidence log BENCH/scaling.py folds into BASELINE.md
    # (solo runs only — set SCALE_RUN_CONTENDED=1 to keep a polluted draw
    # out of the record)
    if os.environ.get("SCALE_RUN_CONTENDED", "") != "1":
        with open(os.path.join(REPO, "BENCH", "scale_results.jsonl"), "a") as fh:
            fh.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
