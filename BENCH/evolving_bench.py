"""Benchmark the evolving-stream driver (r3 verdict item 4).

Measures, at the bench scale factor (default sf0.1 = 20M events), on the
same local[N] layout as bench.py:

1. ``replay_files``            — the batch replay path (bench headline)
2. ``run_ingest_stream``       — plain Structured Streaming ingest
3. ``run_ingest_stream_evolving`` on the SAME no-birth stream — isolates
   the footer-reconciliation + in-trigger guard overhead (target: within
   ~15% of plain streaming)
4. ``run_ingest_stream_evolving`` on a WITH-birth stream, initial schema
   pinned pre-birth — pays exactly one restart-on-widen; measures the
   restart + re-reconciliation cost end-to-end

Each timing is min-of-REPS fresh tables (same min-of-N methodology as
bench.py on this 3x-variance host). Prints one JSON line; record the
numbers in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses cached changelog + session sizing)

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def _birth_changelog(n_events: int) -> str:
    """Like bench.changelog_dir but with the `tool` column born at the
    second batch file (single-segment generation only — the evolution
    cut is first-segment-only by contract)."""
    from etl_pipeline_spark.sources.genlog import write_changelog

    assert n_events <= bench._SEGMENT_EVENTS, (
        "birth stream must be single-segment (evolution_batch contract)"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"etl_bench_birthlog_{n_events}_b{bench.BATCH_SIZE}",
    )
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(path, ignore_errors=True)
        cfg = bench._gen_cfg(n_events, max(200, n_events // 400), 42, 0)
        from dataclasses import replace

        write_changelog(replace(cfg, evolution_batch=1), path)
        with open(done, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import (
        CHANGE_EVENT_SCHEMA_V0,
        TRANSCRIPT_SCHEMA,
        TRANSCRIPT_SCHEMA_V0,
    )
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import (
        replay_files,
        run_ingest_stream,
        run_ingest_stream_evolving,
    )

    sf = bench.sf_from_dir(bench.SF_DIR)
    n_events = max(int(bench.EVENTS_PER_SF * sf), 100_000)
    clog = bench.changelog_dir(n_events)  # untimed, cached
    birth_clog = _birth_changelog(n_events)  # untimed, cached

    spark = get_spark(
        app_name=f"evobench-sf{sf}-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    work = tempfile.mkdtemp(prefix="evobench_")
    cfg = ApplyConfig(lineage_level="batch")
    mft = bench.FILES_PER_BATCH  # streaming analog of files_per_batch

    def fresh(name: str, schema=TRANSCRIPT_SCHEMA) -> MiniLakeTable:
        return MiniLakeTable.create(
            spark, os.path.join(work, name), schema,
            key_cols=["conv_id", "turn_idx"], n_buckets=32, write_mode="mor",
        )

    def timed(fn) -> float:
        runs = []
        for rep in range(REPS):
            t0 = time.time()
            fn(rep)
            runs.append(round(time.time() - t0, 3))
        return min(runs)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def record(name, fn, schema=TRANSCRIPT_SCHEMA, expect_restarts=None):
        tables = {}

        def run(rep):
            t = fresh(f"{name}{rep}", schema)
            tables[rep] = t
            r = fn(t, os.path.join(work, f"ckpt_{name}{rep}"))
            if expect_restarts is not None:
                assert r == expect_restarts, (name, r)

        timings[name] = timed(run)
        rows[name] = tables[REPS - 1].read().count()

    record(
        "replay_files",
        lambda t, _ck: replay_files(
            spark, clog, t, files_per_batch=mft, cfg=cfg,
            pipeline_depth=bench.PIPELINE_DEPTH,
        ),
    )
    record(
        "stream_plain",
        lambda t, ck: run_ingest_stream(
            spark, clog, t, ck, cfg=cfg, max_files_per_trigger=mft
        ),
    )
    record(
        "stream_evolving_nobirth",
        lambda t, ck: run_ingest_stream_evolving(
            spark, clog, t, ck, cfg=cfg, max_files_per_trigger=mft
        ),
        expect_restarts=0,
    )
    record(
        "stream_evolving_birth",
        lambda t, ck: run_ingest_stream_evolving(
            spark, birth_clog, t, ck, cfg=cfg, max_files_per_trigger=mft,
            initial_schema=CHANGE_EVENT_SCHEMA_V0,  # force restart-on-widen
        ),
        schema=TRANSCRIPT_SCHEMA_V0,
        expect_restarts=1,
    )

    assert len(set(rows.values())) <= 2, rows  # birth stream may differ
    assert rows["replay_files"] == rows["stream_plain"]
    assert rows["stream_plain"] == rows["stream_evolving_nobirth"]

    overhead = (
        timings["stream_evolving_nobirth"] / timings["stream_plain"] - 1.0
    )
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "evolving_stream_bench",
                "unit": "sec",
                "sf": sf,
                "cdc_events": n_events,
                "timings": timings,
                "final_rows": rows,
                "evolving_overhead_vs_plain_stream": round(overhead, 4),
                "cpus_used": bench.USED_CPUS,
                "max_files_per_trigger": mft,
                "reps": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
