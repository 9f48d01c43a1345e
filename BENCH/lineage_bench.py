"""Benchmark the row-lineage tax (r5: lake/minilake row lineage).

Row lineage (``row_lineage=True``) swaps the MOR merge's pure hash-agg
pre-reduce for a window + aggregation (same single Exchange, one sort
more) and adds two long columns to every fold output. This measures
what that costs on the bench workload, at the bench scale factor
(default sf0.1 = 20M events), same local[N] layout as bench.py:

1. ``replay_plain``    — bench headline path, row_lineage OFF
2. ``replay_lineage``  — identical replay, row_lineage ON
3. ``final_compact``   — compaction wall on each (fold tax shows here too)
4. ``read_lineage``    — the lineage view's own evaluation wall

Each timing is min-of-REPS fresh tables (min-of-N methodology: this VM
shows up to 3x run-to-run host-steal variance). Prints one JSON line;
record the numbers in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses cached changelog + session sizing)

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import replay_files

    sf = bench.sf_from_dir(bench.SF_DIR)
    n_events = max(int(bench.EVENTS_PER_SF * sf), 100_000)
    clog = bench.changelog_dir(n_events)  # untimed, cached

    spark = get_spark(
        app_name=f"lineagebench-sf{sf}-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    work = tempfile.mkdtemp(prefix="lineagebench_")
    cfg = ApplyConfig(lineage_level="batch")

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def run_variant(name: str, row_lineage: bool) -> MiniLakeTable:
        replay_runs, compact_runs = [], []
        last = None
        for rep in range(REPS):
            t = MiniLakeTable.create(
                spark, os.path.join(work, f"{name}{rep}"),
                TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"],
                n_buckets=32, write_mode="mor", row_lineage=row_lineage,
            )
            t0 = time.time()
            replay_files(
                spark, clog, t, files_per_batch=bench.FILES_PER_BATCH,
                cfg=cfg, pipeline_depth=bench.PIPELINE_DEPTH,
            )
            replay_runs.append(round(time.time() - t0, 3))
            t0 = time.time()
            t.compact(drop_tombstones=True)
            compact_runs.append(round(time.time() - t0, 3))
            last = t
        timings[f"replay_{name}"] = min(replay_runs)
        timings[f"compact_{name}"] = min(compact_runs)
        rows[name] = last.read().count()
        return last

    plain = run_variant("plain", row_lineage=False)
    lineage = run_variant("lineage", row_lineage=True)
    assert rows["plain"] == rows["lineage"], rows

    t0 = time.time()
    n_lineage = lineage.read_lineage().count()
    timings["read_lineage"] = round(time.time() - t0, 3)
    assert n_lineage == rows["lineage"], (n_lineage, rows)

    tax = (
        (timings["replay_lineage"] + timings["compact_lineage"])
        / max(timings["replay_plain"] + timings["compact_plain"], 1e-9)
        - 1.0
    )
    print(json.dumps({
        "metric": "row_lineage_bench",
        "unit": "sec",
        "sf": sf,
        "cdc_events": n_events,
        "timings": timings,
        "final_rows": rows["lineage"],
        "lineage_tax_replay_plus_compact": round(tax, 4),
        "cpus_used": bench.USED_CPUS,
        "pipeline_depth": bench.PIPELINE_DEPTH,
        "files_per_batch": bench.FILES_PER_BATCH,
        "reps": REPS,
    }))
    # plain's table is unused beyond the row-count guard
    del plain


if __name__ == "__main__":
    main()
