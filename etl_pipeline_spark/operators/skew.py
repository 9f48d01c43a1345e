"""Explicit skew-defused aggregation (salted two-phase).

Spark's hash aggregation already collapses per-key duplicates map-side;
what it cannot fix is ONE reducer receiving the partials of a single
pathological hot key from tens of thousands of map tasks. The salted
two-phase aggregate bounds that fan-in: phase 1 groups by
``(keys…, salt)`` so a hot key's partials land on ``n_salts`` reducers;
phase 2 folds the ≤ ``n_salts`` partial rows per key.

Companion to :func:`..operators.lww.lww_reduce_salted` (the same defense
for the LWW reduce), per the north_rule's explicit skew-handling
requirement. The salt is deterministic (hash of a uniform column, never
``rand()``) so retries and replays aggregate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RESPLITTABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregate.

    ``aggs`` maps output alias → ``(fn, input_col)`` with fn in
    {sum, count, min, max} — the algebraic aggregates whose partials
    re-combine losslessly (count folds via sum in phase 2). avg callers
    compose sum/count themselves.

    The salt is always content-derived (``salt_col`` if given, else a
    hash over ALL input columns) — deterministic under replay AND under
    any re-split of the input, unlike ``monotonically_increasing_id``
    whose value depends on the partition layout. That determinism has a
    documented limit: rows that are BYTE-IDENTICAL across every column
    share a salt, so a hot key whose rows are exact duplicates is not
    spread — callers with duplicate-heavy hot keys must pass an explicit
    row-distinguishing ``salt_col`` (an offset/lsn/file-position column;
    any source worth ingesting at this scale has one). Hashing all
    columns rather than just keys+agg-inputs maximizes the spread the
    content can give.
    """
    for alias, (fn, _) in aggs.items():
        if fn not in _RESPLITTABLE:
            raise ValueError(f"{alias}: {fn} is not two-phase-combinable")
    if salt_col is not None:
        salt_src = [F.col(salt_col)]
    else:
        salt_src = [F.col(c) for c in df.columns]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(F.lit(1) if fn == "count" else col).alias(alias)
            for alias, (fn, col) in aggs.items()
        ]
    )
    refold = {"count": "sum"}
    phase2 = phase1.groupBy(*keys).agg(
        *[
            getattr(F, refold.get(fn, fn))(alias).alias(alias)
            for alias, (fn, _) in aggs.items()
        ]
    )
    return phase2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defused equi-join: the big (skewed) side is salted with a
    deterministic hash of ``salt_col``; the small side is replicated
    ``n_salts`` times (explode over the salt domain); the join key
    becomes ``(on…, salt)`` so one hot key's rows spread over
    ``n_salts`` reducers instead of one.

    For the supported join types (inner / left / left_semi — the big
    side is the probe side) result rows are identical to the plain join:
    each big row matches exactly the one replica carrying its salt.
    Right/full-outer are rejected: every unmatched small-side row would
    surface once per salt replica (n_salts null-padded duplicates) —
    salt the other input or de-salt with a post-aggregation instead.
    This is the manual fallback when AQE's runtime skew splitting can't
    see the skew (e.g. the hot key hides behind an exchange reused by
    another stage) — and the same rewrite AQE itself applies. Cost: the
    small side's shuffle volume × n_salts; keep n_salts near the hot
    key's row-count / target-partition-size ratio."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "unmatched small-side rows would be emitted once per salt "
            "replica under right/full-outer"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")
