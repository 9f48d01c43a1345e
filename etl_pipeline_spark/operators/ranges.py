"""Bucketed range join — interval predicates without a cartesian.

Spark has no native range-join optimization (Databricks' range-join hint
is proprietary); a naive ``a.join(b, (b.ts >= a.ts - W) & (b.ts <= a.ts))``
plans BroadcastNestedLoopJoin or CartesianProduct. The standard scale-safe
rewrite: quantize time into buckets of exactly the window width, explode
the probe side into the (at most two) buckets its window overlaps, then a
shuffled **equi-join** on (keys..., bucket) followed by the exact range
filter. Each build-side row lives in exactly one bucket, so no
double-matching and no dedup pass is needed.

Reference analog: none (the reference joins nothing) — this is §2.8
gap-fill mandated by the north_rule's join-coverage requirement, same
family as operators/asof.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Output: all left columns + right payload columns (right's ``on`` and
    ts columns deduplicated). ``how`` = inner | left. The probe (left)
    side explodes into ceil(window/width)+1 = 2 bucket keys; shuffle is
    an equi-join on (on..., bucket) — never a nested-loop.
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    width = float(upper - lower) or 1.0
    n_probes = math.ceil((upper - lower) / width) + 1  # == 2 by construction

    r = right.withColumn("_bkt", F.floor(F.col(right_ts) / width))
    probes = F.array(
        *[
            F.floor((F.col(left_ts) + F.lit(float(lower))) / width) + i
            for i in range(n_probes)
        ]
    )
    l_exp = left.withColumn("_bkt", F.explode(F.array_distinct(probes)))

    cond = [l_exp["_bkt"] == r["_bkt"]] + [l_exp[k] == r[k] for k in on]
    in_range = (r[right_ts] >= l_exp[left_ts] + lower) & (
        r[right_ts] <= l_exp[left_ts] + upper
    )

    if how == "inner":
        joined = l_exp.join(r, cond, "inner").filter(in_range)
        return joined.select(
            *[l_exp[c] for c in left.columns],
            *[r[c] for c in right.columns if c not in set(on) | {"_bkt"}],
        )
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    # LEFT: each probe row left-joins independently; a left row with no
    # match in EITHER probe bucket must survive exactly once → join the
    # range-qualified pairs inner, then union the never-matched lefts.
    matched = l_exp.join(r, cond, "inner").filter(in_range)
    out_cols = [c for c in right.columns if c not in set(on) | {"_bkt"}]
    matched_out = matched.select(
        *[l_exp[c] for c in left.columns], *[r[c] for c in out_cols]
    )
    unmatched = left.join(
        matched_out.select(*left.columns).distinct(),
        on=left.columns,
        how="left_anti",
    )
    for c in out_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(right.schema[c].dataType)
        )
    return matched_out.unionByName(unmatched)
