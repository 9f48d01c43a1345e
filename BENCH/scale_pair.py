"""Calibrated same-window 200M scaling pair (r4 verdict item #2).

The N -> 4N efficiency ratio on this host-multiplexed VM is dominated by
host-steal variance between draws, so a ratio is only evidence when both
levels ran inside one demonstrably quiet, stationary host window. This
orchestrator enforces that protocol end to end:

1. calibrate the hardware parallel ceiling (min-of-5 ``sum(sqrt(id))``
   over 8B rows, pure JVM, zero shuffle) at BOTH levels, BEFORE the pair;
2. run the 200M-event replay back-to-back at local[4] then local[16]
   (same config, fresh JVMs, ``BENCH/scale_run.py``);
3. calibrate AGAIN at both levels, AFTER the pair;
4. ACCEPT the draw only if the before/after calibrations agree within
   ``TOL`` (default 10%) at both levels — i.e. the host window was
   stationary across the whole pair. Rejected draws never enter
   ``BENCH/scale_results.jsonl``.

Two lessons from the rejected 2026-08-17-r5b draw are encoded here:

- A calibration whose own 5 draws are bimodal (observed: [5.3, 5.7, 17.1,
  17.5, 17.0] at local[4]) passes a drift-of-minimums check while proving
  the window is junk. Each calibration now also gates on its internal
  max/min spread (``SCALE_PAIR_CALIB_SPREAD``, default 1.6); a noisy
  PRE-calibration aborts with exit code 5 BEFORE the ~35-minute pair is
  spent, and a noisy POST-calibration rejects the draw.
- Every verdict (accepted or rejected) is appended to
  ``BENCH/scale_pair_windows.jsonl`` so the evidence trail records WHY a
  window produced no accepted draw, not just the survivors.

Accepted draws are appended to the evidence log with the window label and
both calibration receipts embedded, so ``BENCH/scaling.py
--assemble-only`` can fold them into BASELINE.md with the window's OWN
hardware ceiling (never another window's).

Usage:
    python BENCH/scale_pair.py [window_label] [n_events] [depth] [epb]

Defaults: window=YYYY-MM-DD-r5, 200M events, depth 2, 5M-event
micro-batches (the sweep's best-ratio config: small batches keep all 16
threads fed; large batches amortize per-batch fixed cost at low core
counts, inflating the denominator).
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
    lo, hi = LEVELS
    _log(f"window={WINDOW} n={N_EVENTS:,} depth={DEPTH} epb={EPB:,}")

    _log("pre-pair calibration...")
    cal_pre = {c: calibrate(c) for c in LEVELS}
    ceil_pre = cal_pre[lo]["min_s"] / cal_pre[hi]["min_s"]
    _log(f"pre: {cal_pre[lo]['min_s']:.2f}s@{lo} {cal_pre[hi]['min_s']:.2f}s@{hi} "
         f"ceiling {ceil_pre:.2f}x "
         f"spread {_spread(cal_pre[lo]):.2f}@{lo} {_spread(cal_pre[hi]):.2f}@{hi}")
    pre_spreads = {c: _spread(cal_pre[c]) for c in LEVELS}
    if any(s > SPREAD_TOL for s in pre_spreads.values()):
        _record_window({
            "metric": "scale_pair_calibrated_window", "window": WINDOW,
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
    for cpus in LEVELS:
        _log(f"replay at local[{cpus}]...")
        results[cpus] = run_level(cpus)
        _log(f"local[{cpus}]: {results[cpus]['events_per_sec']:,.0f} events/s "
             f"({results[cpus]['replay_s']}s)")

    _log("post-pair calibration...")
    cal_post = {c: calibrate(c) for c in LEVELS}
    ceil_post = cal_post[lo]["min_s"] / cal_post[hi]["min_s"]
    _log(f"post: {cal_post[lo]['min_s']:.2f}s@{lo} {cal_post[hi]['min_s']:.2f}s@{hi} "
         f"ceiling {ceil_post:.2f}x")

    drift = {
        c: abs(cal_post[c]["min_s"] - cal_pre[c]["min_s"]) / cal_pre[c]["min_s"]
        for c in LEVELS
    }
    post_spreads = {c: _spread(cal_post[c]) for c in LEVELS}
    stationary = all(d <= TOL for d in drift.values()) and all(
        s <= SPREAD_TOL for s in post_spreads.values()
    )
    ceiling = min(ceil_pre, ceil_post)  # conservative: the weaker window
    sp = results[hi]["events_per_sec"] / results[lo]["events_per_sec"]
    verdict = {
        "metric": "scale_pair_calibrated_window",
        "window": WINDOW,
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
            str(c): results[c]["events_per_sec"] for c in LEVELS
        },
        "accepted": stationary,
    }
    print(json.dumps(verdict))
    _record_window(verdict)
    if stationary:
        with open(os.path.join(REPO, "BENCH", "scale_results.jsonl"), "a") as fh:
            for c in LEVELS:
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
