"""Real-Iceberg smoke test: create → MERGE → fence round-trip → additive
evolution → replayed-batch fencing, against an actual Iceberg catalog.

The sandbox image has no Iceberg runtime jar, so this script SKIPS
(exit 0, "SKIP: ..." on stdout) unless the session can load
``org.apache.iceberg.spark.SparkCatalog``. On a cluster, run::

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=/tmp/iceberg_smoke_wh \
      --py-files engine.zip \
      BENCH/iceberg_smoke.py

or locally with the jar on the classpath::

    PYSPARK_SUBMIT_ARGS="--packages org.apache.iceberg:... pyspark-shell" \
      python BENCH/iceberg_smoke.py

Prints one PASS/FAIL line per check and exits non-zero on any FAIL —
wire it into the first cluster deployment to validate
``lake/iceberg_backend.py`` end to end (the one component the sandbox
cannot execute).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_spark.session import get_spark  # noqa: E402

CATALOG = os.environ.get("ICEBERG_SMOKE_CATALOG", "lake")
TABLE = f"{CATALOG}.db.smoke_transcripts"

_failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}: {name}" + (f" — {detail}" if detail else ""))
    if not ok:
        _failures.append(name)


def main() -> int:
    spark = get_spark("iceberg-smoke", master=os.environ.get(
        "ICEBERG_SMOKE_MASTER", "local[4]"))
    from etl_pipeline_spark.lake.iceberg_backend import (
        IcebergTable,
        iceberg_available,
    )
    from etl_pipeline_spark.pipeline import ApplyConfig, apply_batch
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0

    if not iceberg_available(spark):
        print("SKIP: Iceberg runtime not on the classpath "
              "(see module docstring for the spark-submit invocation)")
        return 0

    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.db")
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")

    # 1. create
    t = IcebergTable.create(
        spark, TABLE, TRANSCRIPT_SCHEMA_V0,
        key_cols=["conv_id", "turn_idx"], n_buckets=8,
    )
    check("create", {f.name for f in t.schema().fields}
          == {"conv_id", "turn_idx", "role", "text", "ts"})

    def batch(rows, schema=(
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, lsn long, op string")):
        return spark.createDataFrame(rows, schema)

    # 2. first merge through the full apply path (validation, cleaning,
    #    forced LWW pre-reduce via requires_unique_source, fence write).
    #    The duplicate-key rows prove the structural pre-reduce: raw
    #    Iceberg MERGE INTO would throw on them.
    res = apply_batch(
        t,
        batch([
            ("c1", 0, "user", "  hello  ", None, 1, "I"),
            ("c1", 0, "user", "hello v2", None, 2, "U"),   # same key!
            ("c2", 0, "assistant", "hi", None, 3, "I"),
            ("c3", 0, "user", "bye", None, 4, "I"),
        ]),
        batch_id=0,
        cfg=ApplyConfig(),
    )
    check("merge_applies", not res.skipped)
    state = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in t.read().collect()}
    check("lww_and_clean", state.get(("c1", 0)) == "hello v2"
          and state.get(("c2", 0)) == "hi", str(state))

    # 3. fence round-trip: same batch replays as a no-op
    res2 = apply_batch(t, batch(
        [("c1", 0, "user", "ZOMBIE", None, 1, "I")]), batch_id=0)
    check("fence_blocks_replay", res2.skipped
          and t.read().filter("text = 'ZOMBIE'").count() == 0)

    # 4. tombstone: delete stays as a soft-deleted row, late stale
    #    update cannot resurrect it
    apply_batch(t, batch([("c3", 0, None, None, None, 10, "D")]), batch_id=1)
    apply_batch(t, batch([("c3", 0, "user", "stale", None, 5, "U")]), batch_id=2)
    check("tombstone_beats_stale",
          t.read().filter("conv_id = 'c3'").count() == 0)

    # 5. in-flight additive evolution: a batch births `tool`
    apply_batch(t, batch(
        [("c4", 0, "tool", "result", "search", None, 20, "I")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, lsn long, op string"), batch_id=3)
    check("schema_evolution",
          "tool" in [f.name for f in t.schema().fields]
          and t.read().filter("tool = 'search'").count() == 1)
    # pre-evolution rows read the new column as null
    check("pre_birth_nulls",
          t.read().filter("conv_id = 'c1' AND tool IS NULL").count() == 1)

    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    print(f"{'OK' if not _failures else 'FAILED'}: "
          f"{5 + 2 - len(_failures)}/7 checks passed")
    return 1 if _failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
