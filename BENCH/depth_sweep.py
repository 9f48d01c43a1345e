"""Replay tuning sweep: pipeline_depth × micro-batch size × parallelism.

Runs bench.py's CDC replay (replay-only mode, fresh JVM per config) for
every (depth, files_per_batch) combination at both scaling levels and
prints a result table plus the per-level optimum — the evidence behind
the defaults baked into bench.py and the scaling numbers in
BENCH/BASELINE.md.

Usage:  python BENCH/depth_sweep.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
LEVELS = (4, 16)
DEPTHS = (1, 2, 3, 4)
FPBS = (2, 4)  # 10M / 20M-event micro-batches (batch files are 5M events)


def run(cpus: int, depth: int, fpb: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": SF_DIR,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_DEPTH": str(depth),
        "SPARK_GRAFT_FPB": str(fpb),
        "SPARK_GRAFT_REPS": str(REPS),
        "SPARK_GRAFT_REPLAY_ONLY": "1",
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    results: dict[tuple, dict] = {}
    for cpus in LEVELS:
        for depth in DEPTHS:
            for fpb in FPBS:
                r = run(cpus, depth, fpb)
                results[(cpus, depth, fpb)] = r
                print(
                    f"local[{cpus:>2}] depth={depth} fpb={fpb}: "
                    f"replay {r['queries']['cdc_replay']:7.2f}s  "
                    f"{r['cdc_events_per_sec']:>12,.0f} ev/s  "
                    f"(runs {r['cdc_replay_runs']})",
                    flush=True,
                )
    print()
    best = {}
    for cpus in LEVELS:
        key = max(
            (k for k in results if k[0] == cpus),
            key=lambda k: results[k]["cdc_events_per_sec"],
        )
        best[cpus] = key
        print(
            f"best @local[{cpus}]: depth={key[1]} fpb={key[2]} "
            f"→ {results[key]['cdc_events_per_sec']:,.0f} ev/s"
        )
    lo, hi = LEVELS
    eff = (
        results[best[hi]]["cdc_events_per_sec"]
        / results[best[lo]]["cdc_events_per_sec"]
    ) / (hi / lo)
    print(f"raw N→4N efficiency at per-level optima: {eff:.3f}")
    print(json.dumps({str(k): v["cdc_events_per_sec"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
