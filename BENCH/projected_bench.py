"""Projected-read bench: narrow aggregation over a LIVE (unfolded) MOR
table — full-width ``read()`` vs ``read(columns=[...])``.

The LWW fold references every payload column (the winner is a whole
row), so without projection Catalyst cannot prune the scan: a
one-column profile reads the full table width. ``read(columns=...)``
folds over only the requested subset, so the Parquet scan reads just
those columns. The win scales with the table's width-to-subset ratio
(here ~6 columns → 2), i.e. it is much larger on a wide production
schema; text dominates this table's bytes, so excluding it is the
interesting case. Mirror-ordered reps, min per side, one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (session sizing)

N_EVENTS = int(os.environ.get("SPARK_GRAFT_PROJ_EVENTS", "2000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_PROJ_BATCHES", "4"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog
    from etl_pipeline_spark.streaming.ingest import replay_files

    spark = get_spark(
        app_name=f"projected-bench-c{bench.USED_CPUS}",
        master=f"local[{bench.USED_CPUS}]",
        shuffle_partitions=bench.USED_CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    tmp = tempfile.mkdtemp(prefix="projected_bench_")
    try:
        clog = os.path.join(tmp, "changelog")
        write_changelog(
            GenConfig(
                seed=17,
                n_events=N_EVENTS,
                n_conversations=max(N_EVENTS // 400, 1000),
                max_turns=50,
                batch_size=N_EVENTS // BATCHES,
                hot_key_fraction=0.2,
                shuffle_window=1000,
                dup_delivery_rate=0.01,
                dead_letter_rate=0.0,
            ),
            clog,
        )
        table = MiniLakeTable.create(
            spark, os.path.join(tmp, "table"), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=16,
            write_mode="mor",
        )
        replay_files(spark, clog, table)
        # NO compaction: the live delta chain is the case where the fold
        # runs and unprojected reads pay full width

        cols = ["conv_id", "role"]

        def act(df) -> float:
            t0 = time.time()
            df.agg(
                F.count(F.lit(1)), F.countDistinct(*cols)
            ).collect()
            return time.time() - t0

        def pair() -> tuple[float, float]:
            full_t, proj_t = [], []
            for _ in range(REPS):  # mirror order
                full_t.append(act(table.read().select(*cols)))
                proj_t.append(act(table.read(columns=cols)))
                proj_t.append(act(table.read(columns=cols)))
                full_t.append(act(table.read().select(*cols)))
            return min(full_t), min(proj_t)

        full_s, proj_s = pair()

        # WIDE variant: production transcript payloads are fat (long
        # text, tool output). Widen every live row with a 2 KB blob via
        # the engine's own DML (doubling the delta chain as a bonus),
        # then profile the same two narrow columns again — this is the
        # width regime the projection exists for.
        from pyspark.sql import types as T

        table.add_columns([T.StructField("blob", T.StringType(), True)])
        table.update_where("true", {"blob": "repeat('x', 2048)"})
        wide_full_s, wide_proj_s = pair()

        print(
            json.dumps(
                {
                    "metric": "projected_read_vs_full_width_fold",
                    "unit": "sec",
                    "events": N_EVENTS,
                    "table_rows": table.read(columns=["conv_id"]).count(),
                    "profile_cols": cols,
                    "full_width_read_s": round(full_s, 3),
                    "projected_read_s": round(proj_s, 3),
                    "speedup": round(full_s / proj_s, 2),
                    "wide_full_width_read_s": round(wide_full_s, 3),
                    "wide_projected_read_s": round(wide_proj_s, 3),
                    "wide_speedup": round(wide_full_s / wide_proj_s, 2),
                    "cpus_used": bench.USED_CPUS,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
