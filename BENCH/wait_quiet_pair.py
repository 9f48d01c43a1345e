"""Fire the calibrated 200M scaling pair as soon as the host is quiet.

The r4 verdict asks for a same-window >=0.7 raw 200M draw. On this
host-multiplexed VM the hardware ceiling itself swings (observed this
session: pure-JVM 4->16 ceiling 0.67x at 21:56 UTC — local[16] SLOWER
than local[4] on an embarrassingly-parallel sum, i.e. fewer than ~4
physical cores were available). Launching the pair into such a window
wastes 30 minutes and can only produce a useless draw, so this watcher
probes first:

1. every CHECK_EVERY seconds, run a cheap ceiling probe
   (sum(sqrt(id)) over 2B rows at local[4] and local[16], 3 draws each);
   a probe is quiet only if ceiling >= MIN_CEILING AND each level's own
   draws are steady (max/min <= PROBE_SPREAD) — the 2026-08-17-r5b
   rejection showed an instantaneous min-of-2 probe admits bursty hosts;
2. require QUIET_STREAK consecutive quiet probes (default 2, spaced by
   the probe's own ~30 s + a short sleep) before launching
   ``BENCH/scale_pair.py`` (which re-runs the full min-of-5 calibration
   with its own spread + drift gates as the official admission);
3. if scale_pair aborts (exit 5: noisy pre-calibration) or rejects
   (exit 3: drift), RESUME probing until the deadline instead of dying;
4. every probe is appended to ``BENCH/quiet_probe_log.jsonl`` so a
   never-quiet session still leaves an honest record of WHY no draw
   exists for its window.

Usage: python BENCH/wait_quiet_pair.py [window_label] [deadline_epoch]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = sys.argv[1] if len(sys.argv) > 1 else time.strftime("%Y-%m-%d") + "-r5"
DEADLINE = float(sys.argv[2]) if len(sys.argv) > 2 else time.time() + 4 * 3600
MIN_CEILING = float(os.environ.get("QUIET_MIN_CEILING", "2.0"))
CHECK_EVERY = float(os.environ.get("QUIET_CHECK_EVERY", "120"))
PROBE_SPREAD = float(os.environ.get("QUIET_PROBE_SPREAD", "1.35"))
QUIET_STREAK = int(os.environ.get("QUIET_STREAK", "2"))
LOG = os.path.join(REPO, "BENCH", "quiet_probe_log.jsonl")

_PROBE = """
import os, time, json
from pyspark.sql import SparkSession
cpus = os.environ["CAL_CPUS"]
spark = (SparkSession.builder.master(f"local[{cpus}]")
  .config("spark.sql.shuffle.partitions", cpus)
  .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(10**6).selectExpr("sum(id)").collect()
times = []
for _ in range(3):
    t0 = time.time()
    spark.range(2_000_000_000).selectExpr("sum(sqrt(id))").collect()
    times.append(time.time() - t0)
print(json.dumps({"min_s": min(times), "all": times}))
"""


def probe(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE],
        env={**os.environ, "CAL_CPUS": str(cpus)},
        capture_output=True, text=True, timeout=600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    streak = 0
    while time.time() < DEADLINE:
        t0 = time.time()
        try:
            lo, hi = probe(4), probe(16)
        except Exception as exc:  # noqa: BLE001 — probe failure = not quiet
            print(f"[wait_quiet {time.strftime('%H:%M:%S')}] probe failed: {exc}",
                  file=sys.stderr)
            streak = 0
            time.sleep(CHECK_EVERY)
            continue
        ceiling = lo["min_s"] / hi["min_s"]
        spread = max(max(lo["all"]) / min(lo["all"]),
                     max(hi["all"]) / min(hi["all"]))
        quiet = ceiling >= MIN_CEILING and spread <= PROBE_SPREAD
        streak = streak + 1 if quiet else 0
        rec = {"ts": time.time(), "window": WINDOW,
               "probe_s_4": round(lo["min_s"], 2),
               "probe_s_16": round(hi["min_s"], 2),
               "probe_ceiling": round(ceiling, 3),
               "probe_spread": round(spread, 3),
               "quiet": quiet, "streak": streak}
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"[wait_quiet {time.strftime('%H:%M:%S')}] ceiling {ceiling:.2f}x "
              f"spread {spread:.2f}x ({lo['min_s']:.1f}s@4 {hi['min_s']:.1f}s@16) "
              f"{'quiet' if quiet else 'contended'} streak={streak}",
              file=sys.stderr)
        if streak >= QUIET_STREAK:
            streak = 0
            print(f"[wait_quiet {time.strftime('%H:%M:%S')}] launching pair",
                  file=sys.stderr)
            rc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "BENCH", "scale_pair.py"), WINDOW],
            ).returncode
            if rc == 0:
                print("[wait_quiet] pair ACCEPTED — done", file=sys.stderr)
                sys.exit(0)
            print(f"[wait_quiet] pair exited rc={rc} "
                  f"({'drift-rejected' if rc == 3 else 'noisy pre-calib' if rc == 5 else 'error'}) "
                  "— resuming probe loop", file=sys.stderr)
            time.sleep(CHECK_EVERY)
            continue
        time.sleep(max(0.0, CHECK_EVERY - (time.time() - t0)))
    print(f"[wait_quiet] deadline reached with no accepted draw; see {LOG}",
          file=sys.stderr)
    sys.exit(4)


if __name__ == "__main__":
    main()
