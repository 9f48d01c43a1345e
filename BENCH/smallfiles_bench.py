"""Many-small-files evolving-stream bench (r4 verdict item 7).

The evolving driver's footer reconciliation is memoized per immutable
file (streaming/ingest.py ``_FOOTER_CACHE``), benchmarked so far only at
4x5M-row files. This run keeps the bench volume (sf x 200M events) but
splits it across ~2,000 small Parquet files (10k events each at sf0.1)
and measures:

1. ``replay_files`` with volume-packed micro-batches
   (``events_per_batch``) — the batch baseline; 2,000 files never mean
   2,000 micro-batches.
2. ``run_ingest_stream_evolving`` over the same feed, with
   ``_parquet_footer_fields`` instrumented to accumulate the
   driver-side footer-reconciliation wall — cold (empty memo: every
   footer fetched once) and the share of total wall it represents.
3. A warm restart of the reconciliation step alone (memo full) — the
   steady-state cost a long-lived driver actually pays per restart.

Acceptance per the verdict: if cold reconciliation exceeds ~10% of the
evolving run's wall, batch the footer reads per directory. Prints one
JSON line; record it in BENCH/BASELINE.md.
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

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
TARGET_FILES = int(os.environ.get("SPARK_GRAFT_SMALLFILES", "2000"))


def _smallfile_changelog(n_events: int, batch_size: int) -> str:
    from etl_pipeline_spark.sources.genlog import write_changelog

    assert n_events <= bench._SEGMENT_EVENTS, (
        "small-files bench is single-segment by design"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"etl_bench_smallfiles_{n_events}_b{batch_size}",
    )
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(path, ignore_errors=True)
        from dataclasses import replace

        cfg = bench._gen_cfg(n_events, max(200, n_events // 400), 42, 0)
        write_changelog(replace(cfg, batch_size=batch_size), path)
        with open(done, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming import ingest
    from etl_pipeline_spark.streaming.ingest import (
        observed_change_schema,
        replay_files,
        run_ingest_stream_evolving,
    )

    sf = bench.sf_from_dir(bench.SF_DIR)
    n_events = max(int(bench.EVENTS_PER_SF * sf), 100_000)
    batch_size = max(1_000, n_events // TARGET_FILES)
    clog = _smallfile_changelog(n_events, batch_size)  # untimed, cached
    n_files = len(
        [p for p in os.listdir(clog) if p.endswith(".parquet")]
    )

    spark = get_spark(
        app_name=f"smallfiles-sf{sf}-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    work = tempfile.mkdtemp(prefix="smallfiles_")
    cfg = ApplyConfig(lineage_level="batch")
    # volume-packed batching: same ~5M-event micro-batches as the
    # headline bench, however many files that takes
    events_per_batch = bench.BATCH_SIZE
    files_per_trigger = max(1, events_per_batch // batch_size)

    def fresh(name: str) -> MiniLakeTable:
        return MiniLakeTable.create(
            spark, os.path.join(work, name), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=32, write_mode="mor",
        )

    # --- instrument the footer reads (driver-side reconciliation) -----
    footer_wall = {"s": 0.0, "calls": 0}
    orig = ingest._parquet_footer_fields

    def timed_footers(paths):
        t0 = time.time()
        out = orig(paths)
        footer_wall["s"] += time.time() - t0
        footer_wall["calls"] += 1
        return out

    ingest._parquet_footer_fields = timed_footers

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    try:
        runs = []
        for rep in range(REPS):
            t = fresh(f"replay{rep}")
            t0 = time.time()
            replay_files(
                spark, clog, t, cfg=cfg,
                events_per_batch=events_per_batch,
                pipeline_depth=bench.PIPELINE_DEPTH,
            )
            runs.append(round(time.time() - t0, 3))
            rows["replay_files"] = t.read().count() if rep == REPS - 1 else 0
        timings["replay_files"] = min(runs)

        runs, cold_recon = [], []
        for rep in range(REPS):
            ingest._FOOTER_CACHE.clear()  # cold: every footer fetched
            footer_wall["s"], footer_wall["calls"] = 0.0, 0
            t = fresh(f"evo{rep}")
            t0 = time.time()
            r = run_ingest_stream_evolving(
                spark, clog, t,
                os.path.join(work, f"ckpt{rep}"), cfg=cfg,
                max_files_per_trigger=files_per_trigger,
            )
            runs.append(round(time.time() - t0, 3))
            cold_recon.append(round(footer_wall["s"], 3))
            assert r == 0, r  # no birth in this feed
            rows["stream_evolving"] = t.read().count() if rep == REPS - 1 else 0
        timings["stream_evolving"] = min(runs)
        timings["reconcile_cold"] = min(cold_recon)

        # warm restart: memo full, reconciliation alone
        footer_wall["s"] = 0.0
        t0 = time.time()
        observed_change_schema(clog, TRANSCRIPT_SCHEMA)
        timings["reconcile_warm"] = round(time.time() - t0, 3)
    finally:
        ingest._parquet_footer_fields = orig
        shutil.rmtree(work, ignore_errors=True)

    assert rows["replay_files"] == rows["stream_evolving"], rows
    share = timings["reconcile_cold"] / timings["stream_evolving"]
    print(
        json.dumps(
            {
                "metric": "smallfiles_evolving_bench",
                "unit": "sec",
                "sf": sf,
                "cdc_events": n_events,
                "n_files": n_files,
                "events_per_file": batch_size,
                "timings": timings,
                "final_rows": rows["replay_files"],
                "reconcile_share_of_evolving_wall": round(share, 4),
                "cpus_used": bench.USED_CPUS,
                "files_per_trigger": files_per_trigger,
                "events_per_batch": events_per_batch,
                "reps": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
