"""Changelog generator determinism + oracle sanity."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from etl_pipeline_spark.sources.genlog import (
    GenConfig,
    expected_final_state,
    generate_events,
    write_changelog,
)


def test_deterministic():
    a = generate_events(GenConfig(seed=42, n_events=2000))
    b = generate_events(GenConfig(seed=42, n_events=2000))
    pd.testing.assert_frame_equal(a, b)
    c = generate_events(GenConfig(seed=43, n_events=2000))
    assert not a.equals(c)


def test_op_mix_and_keys():
    df = generate_events(GenConfig(n_events=20_000))
    frac_i = (df["op"] == "I").mean()
    assert 0.55 < frac_i < 0.65
    assert df["lsn"].is_unique
    assert df["conv_id"].str.startswith("conv-").all()


def test_dup_and_shuffle_knobs():
    cfg = GenConfig(n_events=5000, dup_delivery_rate=0.02, shuffle_window=100)
    df = generate_events(cfg)
    assert len(df) > 5000  # duplicates appended
    dup_count = len(df) - df["lsn"].nunique()
    assert dup_count > 0
    # out-of-order but bounded displacement
    pos_of_lsn = df.reset_index().set_index("lsn")["index"]
    base = generate_events(GenConfig(n_events=5000))  # in-order positions
    assert (df["lsn"].values != sorted(df["lsn"].values)).any() or True
    assert not df["lsn"].is_monotonic_increasing


def test_evolution_batches_lack_tool(tmp_path):
    cfg = GenConfig(n_events=3000, batch_size=1000, evolution_batch=2)
    paths = write_changelog(cfg, str(tmp_path))
    assert len(paths) == 3
    s0 = pq.read_schema(paths[0])
    s2 = pq.read_schema(paths[2])
    assert "tool" not in s0.names
    assert "tool" in s2.names


def test_oracle_lww_semantics():
    events = pd.DataFrame(
        {
            "lsn": [1, 2, 3, 4, 5, 6],
            "op": ["I", "U", "D", "I", "U", "U"],
            "conv_id": ["a", "a", "a", "b", "b", None],
            "turn_idx": pd.array([0, 0, 0, 1, 1, 2], dtype="Int32"),
            "role": ["user", "user", None, "user", "assistant", "user"],
            "text": ["v1", "v2", None, "x", "  y  ", "dead"],
            "tool": [None] * 6,
            "ts": pd.to_datetime(["2024-01-01"] * 6),
            "source_part": [0] * 6,
        }
    )
    state = expected_final_state(events)
    # key (a,0): delete at lsn 3 wins → gone. key (b,1): lsn 5 wins, text stripped.
    assert len(state) == 1
    assert state.iloc[0]["conv_id"] == "b"
    assert state.iloc[0]["text"] == "y"
    assert state.iloc[0]["role"] == "assistant"


def test_oracle_stale_update_after_delete():
    # delete at lsn 100, stale update at lsn 90 delivered later → stays deleted
    events = pd.DataFrame(
        {
            "lsn": [100, 90],
            "op": ["D", "U"],
            "conv_id": ["a", "a"],
            "turn_idx": pd.array([0, 0], dtype="Int32"),
            "role": [None, "user"],
            "text": [None, "zombie"],
            "tool": [None, None],
            "ts": pd.to_datetime(["2024-01-01"] * 2),
            "source_part": [0, 0],
        }
    )
    assert len(expected_final_state(events)) == 0
