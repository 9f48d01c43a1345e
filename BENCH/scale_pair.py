"""Calibrated same-window 200M scaling pair (r4 verdict item #2).

An N -> 4N efficiency ratio on this host-multiplexed VM is only evidence
when both levels ran inside one demonstrably stationary host window.
This orchestrator enforces that protocol end to end:

1. calibrate the hardware parallel ceiling (``sum(sqrt(id))`` over 8B
   rows, pure JVM, zero shuffle) at BOTH levels, BEFORE the pair;
2. run the 200M-event replay back-to-back at both levels (same config,
   fresh JVMs, ``BENCH/scale_run.py``);
3. calibrate AGAIN at both levels, AFTER the pair;
4. ACCEPT the draw only if the before/after calibrations agree within
   ``TOL`` (default 10%) at both levels AND each calibration's own draws
   are steady (max/min <= ``SCALE_PAIR_CALIB_SPREAD``). Rejected draws
   never enter ``BENCH/scale_results.jsonl``; every verdict (accepted or
   not) is appended to ``BENCH/scale_pair_windows.jsonl`` so the trail
   records WHY a window produced no accepted draw.

Protocol v1 (min-of-5, levels 4/16) produced the r5b rejection whose
"bimodal" calibration ([5.3, 5.7, 17.1, 17.5, 17.0] at local[4]) turned
out not to be host noise at all — it was the host's BURST-CREDIT regime
(see ``BENCH/burst_probe.py``): fast post-idle draws, then a rock-steady
sustained rate. v2 ("sustained-v2", the default) burns the credits
before every calibration and before each replay, then calibrates on
post-burn draws — the rate a multi-minute replay actually runs at.

Accepted draws are appended to the evidence log with the window label and
both calibration receipts embedded, so ``BENCH/scaling.py
--assemble-only`` can fold them into BASELINE.md with the window's OWN
hardware ceiling (never another window's).

Usage:
    python BENCH/scale_pair.py [window_label] [n_events] [depth] [epb]

Defaults: window=YYYY-MM-DD-r5, 200M events, depth 2, 5M-event
micro-batches; levels from ``SCALE_PAIR_LEVELS`` (default ``4,16`` —
within this VM's ~16 physical cores; see the levels note below).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import LEVELS, calibrate  # noqa: E402

WINDOW = sys.argv[1] if len(sys.argv) > 1 else time.strftime("%Y-%m-%d") + "-r5"
N_EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000_000
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 2
EPB = int(sys.argv[4]) if len(sys.argv) > 4 else 5_000_000
TOL = float(os.environ.get("SCALE_PAIR_CALIB_TOL", "0.10"))
SPREAD_TOL = float(os.environ.get("SCALE_PAIR_CALIB_SPREAD", "1.6"))

# Protocol v2 (r5): calibrate SUSTAINED rates, not burst rates. This host
# runs a burst-credit regime (see BENCH/burst_probe.py) — after idle the
# first draws run up to ~2.5x faster than steady state, which (a) made
# min-of-5 calibrations understate the hardware ceiling, (b) made the
# spread/drift gates structurally unpassable (every calibration straddles
# the burst→sustained edge), and (c) explains the r5b "bimodal" abort.
# v2 burns the credits before every calibration AND before each replay
# (so the low level's replay start isn't turbo-subsidized), then gates on
# the post-burn draws. Levels are parameterized. Level choice (empirical,
# window 2026-08-18-r5c): the pure-JVM sustained calibration is flat per
# core up to 32 threads (8→32 ceiling 3.68x), but the REPLAY — parquet
# scan + shuffle + sort, memory-bandwidth- and IO-bound — gained only
# 1.6x from 8→32 in the same window. Beyond the ~16 physical cores the
# extra threads share memory channels and page cache, so an
# oversubscribed pair measures the host's SMT behavior, not the engine.
# On a real cluster N→4N means 4x physical machines; the in-sandbox
# analogue is the within-physical-cores (4, 16) pair, which is the
# default.
PROTOCOL = os.environ.get("SCALE_PAIR_PROTOCOL", "sustained-v2")
PAIR_LEVELS = tuple(
    int(c) for c in os.environ.get("SCALE_PAIR_LEVELS", "4,16").split(",")
) if PROTOCOL == "sustained-v2" else LEVELS
assert len(PAIR_LEVELS) == 2 and PAIR_LEVELS[1] == 4 * PAIR_LEVELS[0], \
    "the north rule's criterion is N vs 4N"

_BURN_SCRIPT = """
import os, time
from pyspark.sql import SparkSession
cpus = os.environ["CAL_CPUS"]
spark = (SparkSession.builder.master(f"local[{cpus}]")
  .config("spark.sql.shuffle.partitions", cpus)
  .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
while time.time() - t0 < 25:
    spark.range(8_000_000_000).selectExpr("sum(sqrt(id))").collect()
"""


def burn(cpus: int) -> None:
    """Drain the host's burst credits at `cpus` threads (~25s saturating
    JVM work) so the measurement that follows runs at the sustained rate
    from its first second."""
    subprocess.run(
        [sys.executable, "-c", _BURN_SCRIPT],
        env={**os.environ, "CAL_CPUS": str(cpus)},
        capture_output=True, text=True, timeout=300,
    )


def _log(msg: str) -> None:
    print(f"[scale_pair {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr)


def _spread(cal: dict) -> float:
    """max/min over one calibration's draws — 1.0 means perfectly steady."""
    return max(cal["all"]) / min(cal["all"])


def _record_window(verdict: dict) -> None:
    with open(os.path.join(REPO, "BENCH", "scale_pair_windows.jsonl"), "a") as fh:
        fh.write(json.dumps(verdict) + "\n")


def run_level(cpus: int) -> dict:
    """One solo replay at `cpus`, NOT self-appended to the evidence log
    (SCALE_RUN_CONTENDED=1) — acceptance is decided here, after the
    post-pair calibration."""
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "BENCH", "scale_run.py"),
            str(N_EVENTS), str(cpus), str(DEPTH), str(EPB),
        ],
        env={**os.environ, "SCALE_RUN_CONTENDED": "1",
             "SCALE_RUN_WINDOW": WINDOW},
        capture_output=True, text=True, timeout=5400,
    )
    if out.returncode != 0:
        raise RuntimeError(f"scale_run local[{cpus}] failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    lo, hi = PAIR_LEVELS
    sustained = PROTOCOL == "sustained-v2"
    _log(f"window={WINDOW} n={N_EVENTS:,} depth={DEPTH} epb={EPB:,} "
         f"levels={PAIR_LEVELS} protocol={PROTOCOL}")

    _log("pre-pair calibration...")
    cal_pre = {c: calibrate(c, sustained=sustained) for c in PAIR_LEVELS}
    ceil_pre = cal_pre[lo]["min_s"] / cal_pre[hi]["min_s"]
    _log(f"pre: {cal_pre[lo]['min_s']:.2f}s@{lo} {cal_pre[hi]['min_s']:.2f}s@{hi} "
         f"ceiling {ceil_pre:.2f}x "
         f"spread {_spread(cal_pre[lo]):.2f}@{lo} {_spread(cal_pre[hi]):.2f}@{hi}")
    pre_spreads = {c: _spread(cal_pre[c]) for c in PAIR_LEVELS}
    if any(s > SPREAD_TOL for s in pre_spreads.values()):
        _record_window({
            "metric": "scale_pair_calibrated_window", "window": WINDOW,
            "protocol": PROTOCOL, "levels": list(PAIR_LEVELS),
            "n_events": N_EVENTS, "pipeline_depth": DEPTH,
            "events_per_batch": EPB,
            "calib_pre": {str(k): v for k, v in cal_pre.items()},
            "pre_spreads": {str(k): round(v, 3) for k, v in pre_spreads.items()},
            "spread_tol": SPREAD_TOL,
            "accepted": False,
            "aborted": "pre-calibration non-stationary (bimodal draws)",
        })
        _log(f"ABORT: pre-calibration spread {max(pre_spreads.values()):.2f}x "
             f"> {SPREAD_TOL}x — host bursty; pair not started")
        sys.exit(5)

    results = {}
    for cpus in PAIR_LEVELS:
        if sustained:
            _log(f"burning burst credits at local[{cpus}]...")
            burn(cpus)
        _log(f"replay at local[{cpus}]...")
        results[cpus] = run_level(cpus)
        _log(f"local[{cpus}]: {results[cpus]['events_per_sec']:,.0f} events/s "
             f"({results[cpus]['replay_s']}s)")

    _log("post-pair calibration...")
    cal_post = {c: calibrate(c, sustained=sustained) for c in PAIR_LEVELS}
    ceil_post = cal_post[lo]["min_s"] / cal_post[hi]["min_s"]
    _log(f"post: {cal_post[lo]['min_s']:.2f}s@{lo} {cal_post[hi]['min_s']:.2f}s@{hi} "
         f"ceiling {ceil_post:.2f}x")

    drift = {
        c: abs(cal_post[c]["min_s"] - cal_pre[c]["min_s"]) / cal_pre[c]["min_s"]
        for c in PAIR_LEVELS
    }
    post_spreads = {c: _spread(cal_post[c]) for c in PAIR_LEVELS}
    stationary = all(d <= TOL for d in drift.values()) and all(
        s <= SPREAD_TOL for s in post_spreads.values()
    )
    ceiling = min(ceil_pre, ceil_post)  # conservative: the weaker window
    sp = results[hi]["events_per_sec"] / results[lo]["events_per_sec"]
    verdict = {
        "metric": "scale_pair_calibrated_window",
        "window": WINDOW,
        "protocol": PROTOCOL,
        "levels": list(PAIR_LEVELS),
        "n_events": N_EVENTS,
        "pipeline_depth": DEPTH,
        "events_per_batch": EPB,
        "calib_pre": {str(k): v for k, v in cal_pre.items()},
        "calib_post": {str(k): v for k, v in cal_post.items()},
        "calib_drift": {str(k): round(v, 4) for k, v in drift.items()},
        "pre_spreads": {str(k): round(v, 3) for k, v in pre_spreads.items()},
        "post_spreads": {str(k): round(v, 3) for k, v in post_spreads.items()},
        "stationary_within_tol": stationary,
        "tol": TOL,
        "spread_tol": SPREAD_TOL,
        "hw_ceiling_speedup": round(ceiling, 3),
        "engine_speedup": round(sp, 3),
        "raw_efficiency": round(sp / 4.0, 3),
        "hw_normalized_efficiency": round(sp / ceiling, 3),
        "events_per_sec": {
            str(c): results[c]["events_per_sec"] for c in PAIR_LEVELS
        },
        "accepted": stationary,
    }
    print(json.dumps(verdict))
    _record_window(verdict)
    if stationary:
        with open(os.path.join(REPO, "BENCH", "scale_results.jsonl"), "a") as fh:
            for c in PAIR_LEVELS:
                fh.write(json.dumps(results[c]) + "\n")
        _log(f"ACCEPTED: raw {verdict['raw_efficiency']} / normalized "
             f"{verdict['hw_normalized_efficiency']} (ceiling {ceiling:.2f}x, "
             f"drift {max(drift.values()):.1%})")
    else:
        _log(f"REJECTED: drift {max(drift.values()):.1%} (tol {TOL:.0%}) / "
             f"post spread {max(post_spreads.values()):.2f}x (tol {SPREAD_TOL}x) "
             "— host window not stationary; draw discarded")
        sys.exit(3)


if __name__ == "__main__":
    main()
