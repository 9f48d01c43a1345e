"""Event validation / dead-letter split.

Generalizes the reference's mandatory-key drop (records without a title
never enter the feed, /root/reference/utils/extract.py:67-74) and
invalid-row filter (transform.py:112-129): change events with a null key
component or an unknown op are never applied — they are diverted to a
dead-letter stream and counted in lineage, not silently dropped.

Implemented as two complementary filters over the same input so Catalyst
plans a single scan per side with the predicate pushed to the Parquet
reader; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import KEY_COLS, OPS


def valid_predicate(
    key_cols: list[str] | None = None, op_col: str = "op"
) -> Column:
    keys = key_cols or KEY_COLS
    pred = F.col(op_col).isin(list(OPS))
    for k in keys:
        pred = pred & F.col(k).isNotNull()
    return pred


def split_valid(
    df: DataFrame, key_cols: list[str] | None = None, op_col: str = "op"
) -> tuple[DataFrame, DataFrame]:
    """Return ``(valid, dead_letter)`` — two lazy views of the input.

    A null op / null key makes the raw predicate NULL in three-valued
    logic; coalesce to false so such rows land in dead-letter instead of
    vanishing from both sides.
    """
    pred = F.coalesce(valid_predicate(key_cols, op_col), F.lit(False))
    return df.filter(pred), df.filter(~pred)
