"""Vector math over array<float|double> embedding columns.

Built-in higher-order functions only (zip_with / aggregate), evaluated
JVM-side inside whole-stage codegen — no UDF, no Python, no data copy.
At 100 TB the embedding column stays columnar Parquet end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    """float32 arrays → double for stable cross-engine arithmetic."""
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def simhash_bits(v: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (sign of the
    projection). ``planes`` is a small driver-side constant (seeded) —
    shipped as literals into the plan, so the projection runs as pure
    columnar arithmetic. Returns array<int> of 0/1."""
    bits = []
    for plane in planes:
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(dot(v, p) >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*bits)


def bits_to_bucket(bits: Column) -> Column:
    """Pack the bit array into a single bucket id (little-endian).
    2^i via pow (exact in double for i < 53; plane counts are ≤ 32) —
    shiftleft needs a literal shift amount, not a lambda variable."""
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.size(bits) - 1),
            lambda b, i: b.cast("long") * F.pow(F.lit(2.0), i).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
