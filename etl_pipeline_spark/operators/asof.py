"""As-of (backward) join — an operator Spark lacks natively.

For every left row, attach the most recent right row of the same key
with ``right_ts <= left_ts`` (inclusive). Implemented as a composition
of built-in DataFrame ops — the union-tag + running-``last`` window
pattern — NOT a per-group ``merge_asof`` pandas UDF:

1. tag both sides and union them on (key, ts) with right-before-left
   tie ordering,
2. one window per key ordered by (ts, side): running ``last`` of the
   right payload with ``ignorenulls`` carries the latest right row
   forward,
3. keep the left rows.

Scale shape: ONE shuffle on the key (the window partition), a
per-partition sort, zero Python. The naive alternative — range join —
plans a cartesian-per-key; the pandas ``merge_asof`` alternative ships
every group through Arrow. This stays in Tungsten end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join (DuckDB ``ASOF JOIN`` semantics:
    ``left.ts >= right.ts``, latest right wins; ties on right ts must be
    pre-collapsed by the caller for determinism)."""
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in on and c != right_ts
        ]

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias(f"{right_ts}{suffix}"),
                    *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
                ).alias("s")
            ).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
        ).alias("_r"),
    )

    # right rows sort before left rows at equal ts → inclusive (>=) match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    out_cols += [
        F.col("_match")[f"{right_ts}{suffix}"].alias(f"{right_ts}{suffix}")
    ]
    out_cols += [
        F.col("_match")[f"{c}{suffix}"].alias(f"{c}{suffix}")
        for c in right_payload
    ]
    return carried.select(*out_cols)
