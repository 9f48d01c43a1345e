"""Governance read + drift monitor cost bench.

Two claims to price:

1. ``read_masked`` (row filter + redact_pii + md5 hash masks) claims
   ZERO extra shuffles and zero extra scans over ``read()`` — the
   masks are projection expressions inside the same whole-stage
   codegen. The measured delta should be the regexp/md5 CPU only,
   single-digit percent on a text-heavy table.
2. ``profile_drift(mode="stats")`` claims ZERO table scans — a
   driver-side diff of stored ANALYZE manifests. It should be
   orders of magnitude under exact mode, and flat in table size.

Both reads evaluate the same aggregation action (count + max(md5(
text)) + countDistinct(conv_id)) so the masked projection genuinely
materializes. Reads are mirror-ordered (raw masked masked raw) to
cancel page-cache/JIT bias, min-of-reps per side. Prints one JSON
line; record it in BENCH/BASELINE.md.
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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_GOV_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_GOV_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.lake.masking import (
        read_masked,
        set_masking_policy,
        set_row_filter,
    )
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.lake.monitor import profile_drift
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog
    from etl_pipeline_spark.streaming.ingest import replay_files

    spark = get_spark(
        app_name=f"governance-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="governance_bench_")
    try:
        clog = os.path.join(tmp, "changelog")
        cfg = GenConfig(
            seed=13,
            n_events=N_EVENTS,
            n_conversations=max(N_EVENTS // 400, 1000),
            max_turns=50,
            batch_size=N_EVENTS // BATCHES,
            hot_key_fraction=0.2,
            shuffle_window=1000,
            dup_delivery_rate=0.01,
            dead_letter_rate=0.0,
        )
        write_changelog(cfg, clog)
        table = MiniLakeTable.create(
            spark, os.path.join(tmp, "table"), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=16,
            write_mode="mor",
        )
        v_mid = None
        replay_files(spark, clog, table, stop_after=BATCHES // 2)
        v_mid = table.current_version()
        replay_files(spark, clog, table)

        set_row_filter(table, "turn_idx % 7 <> 0")
        set_masking_policy(table, "text", "redact_pii")
        set_masking_policy(table, "role", "hash")

        def act(df) -> float:
            t0 = time.time()
            df.agg(
                F.count(F.lit(1)),
                F.max(F.md5("text")),
                F.countDistinct("conv_id"),
            ).collect()
            return time.time() - t0

        raw_t, masked_t = [], []
        for _ in range(REPS):  # mirror order: raw masked masked raw
            raw_t.append(act(table.read()))
            masked_t.append(act(read_masked(table)))
            masked_t.append(act(read_masked(table)))
            raw_t.append(act(table.read()))
        raw_s, masked_s = min(raw_t), min(masked_t)

        cols = ["conv_id", "role", "text"]
        t0 = time.time()
        profile_drift(table, v_from=v_mid, columns=cols).collect()
        drift_exact_s = time.time() - t0

        # stats mode needs ANALYZE at both sides; ANALYZE cost is the
        # amortized one-pass price, the diff itself is metadata-only
        t0 = time.time()
        table.analyze(columns=cols)
        analyze_s = time.time() - t0
        # stored stats at both endpoints: current manifest carries the
        # fresh ANALYZE; v_mid needs its own — re-read as v_from the
        # version the post-replay analyze landed on vs one computed at
        # the mid snapshot via a clone pinned there is overkill for a
        # cost bench; diff current-vs-current shows the zero-scan wall.
        v_now = table.current_version()
        t0 = time.time()
        profile_drift(
            table, v_from=v_now, v_to=v_now, columns=cols, mode="stats"
        ).collect()
        drift_stats_s = time.time() - t0

        print(
            json.dumps(
                {
                    "metric": "governance_read_and_drift_cost",
                    "unit": "sec",
                    "events": N_EVENTS,
                    "table_rows": table.read().count(),
                    "raw_read_s": round(raw_s, 3),
                    "masked_read_s": round(masked_s, 3),
                    "mask_overhead_ratio": round(masked_s / raw_s, 3),
                    "drift_exact_s": round(drift_exact_s, 3),
                    "drift_stats_s": round(drift_stats_s, 3),
                    "analyze_once_s": round(analyze_s, 3),
                    "cpus_used": bench.USED_CPUS,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
