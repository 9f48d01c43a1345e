"""Characterize the host's CPU burst-credit regime (r5 discovery).

Why this exists: every prior calibration protocol here assumed run-to-run
variance was host *steal* (another tenant taking cores away). The r5
session found the dominant effect is the opposite — a *burst* regime:
after idle time, the first ~2 draws of a fresh measurement run ~2.5x
FASTER than the steady rate, then throughput settles to a stable
sustained level (cgroup cpu.max-burst / turbo-credit behavior; credits
refill within ~1-2 min of idle). Consequences, all visible in the
historical record:

- a min-of-N calibration taken after idle measures the BURST rate, not
  the rate a multi-minute replay actually runs at — the "bimodal"
  pre-calibration that aborted window 2026-08-17-r5b ([5.3, 5.7, 17.1,
  17.5, 17.0] at local[4]) was credits running out mid-calibration, and
  its 17s tail was a rock-steady sustained rate, not noise;
- the burst multiple is largest at LOW parallelism (few busy cores →
  more headroom), so burst-polluted calibrations systematically
  UNDERSTATE the hardware ceiling (observed: "1.5x" instantaneous
  ceilings while the sustained ceiling is ~4.1x) and overstate the low
  level's replay throughput denominator;
- at SUSTAINED rates this VM is near-linear to 32 threads
  (~105-118M rows/s/core at 4, 8, 16 and 32 in the r5 session) — the
  long-standing "local[32] thrashes" note was a burst-era artifact.

This script prints the evidence for the current window: N draws per
level, the burst draws visible at the head, and sustained stats over the
tail. ``scale_pair.py --protocol sustained`` (v2) is the consumer of the
insight: it burns the credits first and calibrates on the sustained tail,
which is the honest denominator for a multi-minute replay.

Usage: python BENCH/burst_probe.py [levels_csv] [draws]
(defaults: 4,8,16,32 and 9 draws of 2B rows each)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEVELS = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "4,8,16,32").split(",")]
DRAWS = int(sys.argv[2]) if len(sys.argv) > 2 else 9
TAIL = 4  # sustained stats over the last TAIL draws

_PROBE = """
import os, time, json
from pyspark.sql import SparkSession
cpus = os.environ["CAL_CPUS"]
spark = (SparkSession.builder.master(f"local[{cpus}]")
  .config("spark.sql.shuffle.partitions", cpus)
  .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(10**6).selectExpr("sum(sqrt(id))").collect()  # JIT warm
times = []
for _ in range(int(os.environ["PROBE_DRAWS"])):
    t0 = time.time()
    spark.range(2_000_000_000).selectExpr("sum(sqrt(id))").collect()
    times.append(round(time.time() - t0, 3))
print(json.dumps(times))
"""


def probe(cpus: int) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE],
        env={**os.environ, "CAL_CPUS": str(cpus), "PROBE_DRAWS": str(DRAWS)},
        capture_output=True, text=True, timeout=900,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rows = {}
    for c in LEVELS:
        times = probe(c)
        tail = times[-TAIL:]
        rows[c] = {
            "all": times,
            "sustained_min_s": min(tail),
            "sustained_spread": round(max(tail) / min(tail), 3),
            "burst_multiple": round(min(tail) / min(times), 2),
            "sustained_mrows_per_core_s": round(
                2_000 / min(tail) / c, 1
            ),
        }
        print(
            f"local[{c:>2}]: {times}  sustained {min(tail):.2f}s "
            f"(spread {rows[c]['sustained_spread']}x, burst head "
            f"{rows[c]['burst_multiple']}x, "
            f"{rows[c]['sustained_mrows_per_core_s']}M rows/core/s)",
            file=sys.stderr,
        )
    if len(LEVELS) > 1:
        lo, hi = LEVELS[0], LEVELS[-1]
        rows["sustained_ceiling"] = round(
            rows[lo]["sustained_min_s"] / rows[hi]["sustained_min_s"], 2
        )
    print(json.dumps({"metric": "burst_regime_probe", "levels": rows}))


if __name__ == "__main__":
    main()
