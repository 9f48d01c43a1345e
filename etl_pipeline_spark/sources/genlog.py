"""Deterministic synthetic change-log generator + independent oracle.

Generates a binlog/WAL-style stream of I/U/D change events over the
transcript key space ``(conv_id, turn_idx)`` as ordered Parquet batch
files — the unit a Structured Streaming file source replays as
micro-batches. All knobs per FIXTURES.md §4; fully seeded, numpy-
vectorized (scales to 10^8+ events without per-row Python).

The **oracle** (`expected_final_state`) computes the final table state
independently of the engine — pandas groupby last-LSN with tombstone
drop — so replay-equality tests never compare the engine to itself.

Dirty-value corpus (FIXTURES.md §3) mirrors the reference's cleaning
test corpus (/root/reference/tests/test_transform.py:174-271):
whitespace padding, sentinel junk, nulls, null-key dead-letter rows,
duplicate delivery.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.cleaning import clean_texts_pandas

EPOCH_MS = 1_700_000_000_000  # fixed deterministic time base (UTC)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "none"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog alpha beta gamma delta "
    "model agent turn reply context token stream batch merge state "
    "query plan shuffle partition commit snapshot offset".split()
)
SENTINELS = np.array(["[unavailable]", "not rated", "n/a", ""])


@dataclass
class GenConfig:
    seed: int = 42
    n_conversations: int = 200
    max_turns: int = 20
    n_events: int = 10_000
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1)  # I, U, D
    hot_key_fraction: float = 0.0  # fraction of events on 1% of convs
    shuffle_window: int = 0  # out-of-order delivery jitter (positions)
    dup_delivery_rate: float = 0.0  # at-least-once duplicates
    batch_size: int = 1_000  # events per parquet file
    evolution_batch: int = 0  # first batch index containing `tool`
    dead_letter_rate: float = 0.0  # events with null key (dead-letter)
    dirty_ws_rate: float = 0.10  # whitespace-padded text
    dirty_sentinel_rate: float = 0.05  # sentinel junk text
    dirty_null_rate: float = 0.03  # null text
    n_source_parts: int = 4
    # lsn space starts at lsn_offset+1 — lets independent generator
    # processes emit disjoint, monotone segments of one logical stream
    # (bench.changelog_dir uses this to build the 200M-event changelog
    # without a single 100GB in-memory frame)
    lsn_offset: int = 0
    extra: dict = field(default_factory=dict)


def generate_events(cfg: GenConfig) -> pd.DataFrame:
    """Generate the change-event frame in **delivery order** (post-jitter,
    post-duplicate-injection). Columns follow CHANGE_EVENT_SCHEMA; the
    ``tool`` column is always present here — batching drops it for
    pre-evolution files."""
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events

    lsn = np.arange(cfg.lsn_offset + 1, cfg.lsn_offset + n + 1, dtype=np.int64)

    # --- key selection (optionally zipf-skewed onto 1% of conversations)
    conv_idx = rng.integers(0, cfg.n_conversations, size=n)
    if cfg.hot_key_fraction > 0:
        n_hot_convs = max(1, cfg.n_conversations // 100)
        hot_mask = rng.random(n) < cfg.hot_key_fraction
        # zipf-ish weights over the hot conv pool
        ranks = np.arange(1, n_hot_convs + 1, dtype=np.float64)
        w = 1.0 / ranks**1.5
        w /= w.sum()
        conv_idx[hot_mask] = rng.choice(n_hot_convs, size=hot_mask.sum(), p=w)
    turn_idx = rng.integers(0, cfg.max_turns, size=n).astype(np.int32)

    # --- ops
    op = rng.choice(np.array(["I", "U", "D"]), size=n, p=list(cfg.op_mix))
    is_del = op == "D"

    # --- payload (vectorized; after-image null for deletes)
    w1 = _WORDS[rng.integers(0, len(_WORDS), size=n)]
    w2 = _WORDS[rng.integers(0, len(_WORDS), size=n)]
    w3 = _WORDS[rng.integers(0, len(_WORDS), size=n)]
    text = np.char.add(
        np.char.add(np.char.add(w1, " "), np.char.add(w2, " ")),
        np.char.add(w3, np.char.mod(" #%d", lsn)),
    ).astype(object)

    r = rng.random(n)
    ws_mask = r < cfg.dirty_ws_rate
    text[ws_mask] = np.char.add(
        np.char.add("  ", text[ws_mask].astype(str)), "  "
    ).astype(object)
    sent_mask = (r >= cfg.dirty_ws_rate) & (
        r < cfg.dirty_ws_rate + cfg.dirty_sentinel_rate
    )
    text[sent_mask] = SENTINELS[rng.integers(0, len(SENTINELS), size=sent_mask.sum())]
    null_mask = (r >= cfg.dirty_ws_rate + cfg.dirty_sentinel_rate) & (
        r < cfg.dirty_ws_rate + cfg.dirty_sentinel_rate + cfg.dirty_null_rate
    )
    text[null_mask] = None
    text[is_del] = None

    role = ROLES[rng.integers(0, len(ROLES), size=n)].astype(object)
    role[is_del] = None
    tool = TOOLS[rng.integers(0, len(TOOLS), size=n)].astype(object)
    tool[rng.random(n) < 0.7] = None
    tool[is_del] = None

    ts = (EPOCH_MS + lsn * 1000).astype("datetime64[ms]")

    conv_id = np.char.mod("conv-%06d", conv_idx).astype(object)
    turn = turn_idx.astype(object)
    if cfg.dead_letter_rate > 0:
        dl = rng.random(n) < cfg.dead_letter_rate
        half = rng.random(n) < 0.5
        conv_id[dl & half] = None
        turn[dl & ~half] = None

    source_part = (conv_idx % cfg.n_source_parts).astype(np.int32)

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": pd.array(turn, dtype="Int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "source_part": source_part,
        }
    )

    # --- duplicate delivery (at-least-once source): same lsn, identical row
    if cfg.dup_delivery_rate > 0:
        dup_idx = rng.random(len(df)) < cfg.dup_delivery_rate
        dups = df[dup_idx]
        df = pd.concat([df, dups], ignore_index=True)

    # --- out-of-order delivery: jitter positions within ±shuffle_window
    if cfg.shuffle_window > 0:
        pos = np.arange(len(df), dtype=np.float64)
        pos += rng.uniform(-cfg.shuffle_window, cfg.shuffle_window, size=len(df))
        df = df.iloc[np.argsort(pos, kind="stable")].reset_index(drop=True)

    return df


def generate_delivered_events(cfg: GenConfig) -> pd.DataFrame:
    """Events as actually *delivered*: pre-evolution batches are written
    without the ``tool`` column, so those events' tool values never reach
    the wire — the oracle must see them as null too."""
    df = generate_events(cfg)
    if cfg.evolution_batch > 0:
        cut = min(cfg.evolution_batch * cfg.batch_size, len(df))
        df = df.copy()
        df.iloc[:cut, df.columns.get_loc("tool")] = None
    return df


def write_changelog(
    cfg: GenConfig, out_dir: str, start_index: int = 0
) -> list[str]:
    """Write the event stream as ordered parquet batch files.

    Batches with index < ``evolution_batch`` are written **without** the
    ``tool`` column in their Parquet schema (FIXTURES.md §5) — the
    in-flight additive schema evolution fixture.
    ``start_index`` offsets the batch-file numbering (segmented
    multi-process generation of one logical stream).
    Returns the list of file paths in delivery order.
    """
    if start_index > 0 and cfg.evolution_batch > 0:
        # The evolution cut (both the row-nulling in generate_events and
        # the column drop below) is segment-local; a later segment would
        # re-drop `tool` at its own start — a mid-stream column
        # "un-birth" that violates additive evolution. Segmented callers
        # must put the birth entirely in the first segment.
        raise ValueError(
            "evolution_batch > 0 is only valid in the first segment "
            "(start_index == 0); later segments would un-birth the column"
        )
    df = generate_events(cfg)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n_batches = (len(df) + cfg.batch_size - 1) // cfg.batch_size
    for b0 in range(n_batches):
        b = start_index + b0
        chunk = df.iloc[b0 * cfg.batch_size : (b0 + 1) * cfg.batch_size]
        if b0 < cfg.evolution_batch:
            chunk = chunk.drop(columns=["tool"])
        table = pa.Table.from_pandas(chunk, preserve_index=False)
        path = os.path.join(out_dir, f"batch-{b:06d}.parquet")
        # small row groups keep one batch file splittable across many
        # scan tasks (a single row group pins the whole map side of a
        # micro-batch to one core, however many executors exist)
        pq.write_table(table, path, row_group_size=32_768)
        paths.append(path)
    return paths


# --------------------------------------------------------------------------
# Oracle — independent reduction (never touches engine code paths)
# --------------------------------------------------------------------------


def expected_final_state(events: pd.DataFrame, clean: bool = True) -> pd.DataFrame:
    """Expected final transcript state: per-key last-writer-wins by LSN,
    tombstoned keys dropped, dead-letter (null-key / bad-op) rows never
    applied, text cleaned. Sorted by (conv_id, turn_idx).
    """
    df = events.copy()
    if "tool" not in df.columns:
        df["tool"] = None
    df = df[df["conv_id"].notna() & df["turn_idx"].notna()]
    df = df[df["op"].isin(["I", "U", "D"])]
    # LWW: max lsn per key. NOTE: not groupby().last() — pandas .last()
    # skips nulls per-column, which would resurrect overwritten values
    # when the last writer carries nulls. Stable sort + keep="last" takes
    # the whole winning row atomically.
    df = df.sort_values("lsn", kind="stable").drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    df = df[df["op"] != "D"]
    if clean:
        df["text"] = clean_texts_pandas(df["text"])
    out = df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].sort_values(
        ["conv_id", "turn_idx"]
    )
    return out.reset_index(drop=True)
