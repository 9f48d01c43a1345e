"""Property-based tests (hypothesis): the engine's LWW apply must match
the independent oracle for ARBITRARY event sequences — any op pattern,
any delivery order, any duplication, any batch split points.

This is the generalized form of the golden replay gate: instead of one
seeded changelog, hypothesis searches the space of adversarial little
histories (insert-after-delete, repeated deletes, stale updates at every
relative position, duplicate LSNs...).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.pipeline import ApplyConfig, apply_batch
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
from etl_pipeline_spark.sources.genlog import expected_final_state

KEYS = ["conv_id", "turn_idx"]

# small key space so ops collide heavily
conv_ids = st.sampled_from(["a", "b", "c"])
turn_idxs = st.integers(min_value=0, max_value=2)
ops = st.sampled_from(["I", "U", "D"])
texts = st.sampled_from(["x", "y", "  pad  ", "[unavailable]", None])

events_strategy = st.lists(
    st.tuples(conv_ids, turn_idxs, ops, texts),
    min_size=1,
    max_size=25,
)
# where to split the delivered sequence into micro-batches
split_strategy = st.integers(min_value=1, max_value=5)
# permutation seed for delivery order
perm_strategy = st.randoms(use_true_random=False)


def _events_frame(raw: list, order: list[int]) -> pd.DataFrame:
    rows = []
    for lsn, (conv, turn, op, text) in enumerate(raw, start=1):
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "role": "user" if op != "D" else None,
                "text": None if op == "D" else text,
                "tool": None,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=lsn),
                "source_part": lsn % 2,
            }
        )
    df = pd.DataFrame(rows)
    return df.iloc[order].reset_index(drop=True)


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=events_strategy, n_batches=split_strategy, rnd=perm_strategy)
def test_lww_apply_matches_oracle(
    spark, tmp_path_factory, raw, n_batches, rnd, write_mode
):
    order = list(range(len(raw)))
    rnd.shuffle(order)  # arbitrary delivery order
    delivered = _events_frame(raw, order)

    oracle = expected_final_state(delivered)

    root = tmp_path_factory.mktemp(f"prop_{write_mode}")
    table = MiniLakeTable.create(
        spark, str(root / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=4, write_mode=write_mode,
    )
    cfg = ApplyConfig(lineage_level="batch", auto_compact_max_files=3)
    size = max(1, len(delivered) // n_batches)
    for b, start in enumerate(range(0, len(delivered), size)):
        chunk = spark.createDataFrame(delivered.iloc[start : start + size])
        apply_batch(table, chunk, b, cfg=cfg)

    eng = (
        table.read()
        .toPandas()
        .sort_values(KEYS)
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text"]]
    )
    exp = oracle[["conv_id", "turn_idx", "role", "text"]].reset_index(drop=True)
    assert len(eng) == len(exp), f"\nengine:\n{eng}\noracle:\n{exp}"
    for col in eng.columns:
        a = ["∅" if pd.isna(v) else v for v in eng[col]]
        b = ["∅" if pd.isna(v) else v for v in exp[col]]
        assert a == b, f"{col}:\nengine:\n{eng}\noracle:\n{exp}"
