"""Benchmark harness.

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., ...extras}

Workload:

1. **cdc_replay** — the engine's reason to exist: replay a synthetic
   changelog (n_events ∝ sf, seeded, generated+cached untimed) through
   validate → clean → LWW → bucket-pruned MERGE into a MiniLake table.
   Reported as seconds + events/sec.
2. The headline analytics queries from the driver contract, each forced
   to full evaluation with the ``noop`` sink (count() alone lets Spark
   prune the projection).

Scaling evidence (north_rule: ≥0.8 efficiency from N to 4N executors;
sandbox stand-in per driver instruction): run this script twice via
``BENCH/scaling.py`` — it runs this script at N and 4N cores in fresh
processes (with a hardware-ceiling calibration) and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# This VM's vCPUs are host-multiplexed: local[32] measures ~35% SLOWER
# than local[16] on the replay (BENCH/BASELINE.md methodology). Sizing
# worker threads to effective cores is the same call as sizing executor
# cores on a real cluster; both requested and used counts are reported.
USED_CPUS = min(CPUS, 16)
EVENTS_PER_SF = 200_000_000  # sf0.1 → 20M change events
BATCH_SIZE = int(os.environ.get("SPARK_GRAFT_BATCH", "5000000"))
# Tuning knobs, overridable for BENCH/depth_sweep.py (defaults = the
# swept optimum recorded in BENCH/BASELINE.md). fpb=1 (5M-event
# micro-batches): best local[16] absolute in the r4 sweep (16.6s vs 17.2
# for depth3/fpb2) — smaller batches keep every core fed at high
# parallelism; local[4] prefers bigger batches (fixed per-batch cost
# amortizes worse at low core counts), but the scaling rule compares the
# SAME config at both levels.
FILES_PER_BATCH = int(os.environ.get("SPARK_GRAFT_FPB", "1"))
PIPELINE_DEPTH = int(os.environ.get("SPARK_GRAFT_DEPTH", "2"))
REPLAY_REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
REPLAY_ONLY = os.environ.get("SPARK_GRAFT_REPLAY_ONLY", "") == "1"

BENCH_QUERIES = [
    "cdc_lww_state",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "top_orders_per_customer",
    "events_sessionization",
    "events_hourly_stats",
    "docs_exact_dedup",
    "docs_minhash_near_dups",
    "emb_knn_bruteforce",
    "purchase_views_within_hour",
    "user_event_paths",
]


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


# Above this size the one-shot numpy generator's string intermediates
# exceed RAM (a 200M-event frame peaks >100 GB); generate in disjoint
# lsn segments, one process each, in parallel.
_SEGMENT_EVENTS = 20_000_000


def _gen_cfg(n_events: int, n_conversations: int, seed: int, lsn_offset: int):
    from etl_pipeline_spark.sources.genlog import GenConfig

    return GenConfig(
        seed=seed,
        n_events=n_events,
        n_conversations=n_conversations,
        max_turns=50,
        batch_size=BATCH_SIZE,
        hot_key_fraction=0.2,
        shuffle_window=1000,
        dup_delivery_rate=0.01,
        # dead letters are correctness-tested in tests/; at bench size a
        # nonzero rate adds one extra (serial-cost) job per batch
        dead_letter_rate=0.0,
        lsn_offset=lsn_offset,
    )


def _write_segment(
    path: str, n_events: int, n_convs: int, seed: int,
    lsn_offset: int, start_index: int,
) -> None:
    from etl_pipeline_spark.sources.genlog import write_changelog

    write_changelog(
        _gen_cfg(n_events, n_convs, seed, lsn_offset), path,
        start_index=start_index,
    )


def changelog_dir(n_events: int) -> str:
    """Generate (once, cached) the bench changelog. Generation is numpy,
    untimed — the bench measures the engine, not the generator. Streams
    larger than one in-memory frame are produced as disjoint, monotone
    lsn segments by a process pool (same logical stream: shared
    conversation key space, per-segment delivery jitter)."""
    from etl_pipeline_spark.sources.genlog import write_changelog

    path = os.path.join(
        tempfile.gettempdir(), f"etl_bench_changelog_{n_events}_b{BATCH_SIZE}"
    )
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(path, ignore_errors=True)
        n_convs = max(200, n_events // 400)
        if n_events <= _SEGMENT_EVENTS:
            write_changelog(_gen_cfg(n_events, n_convs, 42, 0), path)
        else:
            # plain subprocess workers (not multiprocessing spawn — its
            # main-module re-import bites any caller that invokes this
            # at import time); ~10 GB peak each, 5 in flight
            import subprocess

            segs = []
            # files-per-segment numbering stride: segments never collide
            # and sorted file order == lsn order across segments
            stride = (_SEGMENT_EVENTS * 2) // BATCH_SIZE
            off = 0
            i = 0
            while off < n_events:
                seg = min(_SEGMENT_EVENTS, n_events - off)
                segs.append((path, seg, n_convs, 42 + i, off, i * stride))
                off += seg
                i += 1
            running: list = []
            for args in segs:
                while len(running) >= 5:
                    done_p = running.pop(0)
                    if done_p.wait() != 0:
                        raise RuntimeError("segment generator failed")
                cmd = [
                    sys.executable, "-c",
                    "import sys; sys.path.insert(0, sys.argv[1]); "
                    "import bench; bench._write_segment(sys.argv[2], "
                    "*map(int, sys.argv[3:]))",
                    os.path.dirname(os.path.abspath(__file__)),
                    args[0], *[str(a) for a in args[1:]],
                ]
                running.append(subprocess.Popen(cmd))
            for p_ in running:
                if p_.wait() != 0:
                    raise RuntimeError("segment generator failed")
        with open(done, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.queries import QUERIES
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import replay_files

    sf = sf_from_dir(SF_DIR)
    n_events = max(int(EVENTS_PER_SF * sf), 100_000)

    clog = changelog_dir(n_events)  # untimed

    # Shuffle partitions clamp: this VM's vCPUs are host-multiplexed and
    # shuffle-heavy stages REGRESS past ~16-way concurrency (measured in
    # BENCH/BASELINE.md); tasks-per-stage is a tuning knob, not a
    # correctness one.
    spark = get_spark(
        app_name=f"bench-sf{sf}-c{USED_CPUS}",
        master=f"local[{USED_CPUS}]",
        shuffle_partitions=USED_CPUS,
        extra_conf={
            # Changelog batch files are ~165MB; at the default 128MB split
            # size a 2-file micro-batch scans as FOUR map tasks — the
            # scan → clean → bucket-hash stage then caps at 4 cores at ANY
            # parallelism level (r01's 0.465 scaling number was exactly
            # this). 16MB splits give the map stage ~20 tasks per batch,
            # the same split sizing a real cluster would use to keep
            # every executor fed.
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    # JVM/codegen/Python-worker warm-up (untimed): one tiny batch through
    # the full apply pipeline into a throwaway table, so the timed replay
    # measures steady-state throughput (a 10^10-event deployment amortizes
    # JIT + worker spawn over thousands of batches).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    work = tempfile.mkdtemp(prefix="bench_lake_")
    from etl_pipeline_spark.pipeline import apply_batch
    from etl_pipeline_spark.sources.changelog import list_batch_files
    from etl_pipeline_spark.sources.genlog import GenConfig as _GC
    from etl_pipeline_spark.sources.genlog import write_changelog as _wc

    warm_dir = os.path.join(work, "warm_clog")
    _wc(_GC(seed=7, n_events=20_000, batch_size=20_000), warm_dir)
    warm_table = MiniLakeTable.create(
        spark, os.path.join(work, "warm_table"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=32, write_mode="mor",
    )
    apply_batch(
        warm_table, spark.read.parquet(list_batch_files(warm_dir)[0]), 0
    )
    warm_table.compact(drop_tombstones=False)

    timings: dict[str, float] = {}

    # --- 1. CDC replay throughput -------------------------------------
    # n_buckets=32 fixed (table layout is workload-defined, not core-
    # count-defined); write_mode="mor" — O(batch) appends + amortized
    # compaction, the 10^10-event path.
    from etl_pipeline_spark.pipeline import ApplyConfig

    # min-of-2: this VM shows up to 3x run-to-run host-steal variance
    # (BENCH/BASELINE.md methodology) — a single draw misstates steady-
    # state throughput in either direction.
    replay_runs = []
    final_rows = 0
    for rep in range(REPLAY_REPS):
        rep_table = MiniLakeTable.create(
            spark,
            os.path.join(work, f"table{rep}"),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            n_buckets=32,
            write_mode="mor",
        )
        t0 = time.time()
        # The MOR merge bucket-clusters + LWW-pre-reduces in ONE shuffle
        # (minilake.merge), so pipeline-level pre_reduce would only add a
        # redundant keys-shuffle here. pipeline_depth=2 overlaps batch
        # k+1's job with batch k's (commits stay batch-ordered): the
        # overlap fills each batch's serial driver time AND its stage
        # idle phases — measured 24.3s → 14.7s at local[16].
        replay_files(
            spark, clog, rep_table, files_per_batch=FILES_PER_BATCH,
            cfg=ApplyConfig(lineage_level="batch"),
            pipeline_depth=PIPELINE_DEPTH,
        )
        rep_table.compact(drop_tombstones=False)  # end-of-replay fold, counted
        replay_runs.append(round(time.time() - t0, 3))
        final_rows = rep_table.read().count()
    replay_s = min(replay_runs)
    timings["cdc_replay"] = replay_s
    shutil.rmtree(work, ignore_errors=True)

    # --- 2. headline queries (noop sink forces full evaluation) -------
    for name in [] if REPLAY_ONLY else BENCH_QUERIES:
        q = QUERIES[name]
        t0 = time.time()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_plus_headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cdc_events": n_events,
                "cdc_events_per_sec": round(n_events / replay_s, 1),
                "cdc_final_rows": final_rows,
                "cdc_replay_runs": replay_runs,
                "pipeline_depth": PIPELINE_DEPTH,
                "files_per_batch": FILES_PER_BATCH,
                "cpus": CPUS,
                "cpus_used": USED_CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
