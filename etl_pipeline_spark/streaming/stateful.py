"""Custom stateful streaming operator: per-key LSN high-water dedup.

``applyInPandasWithState`` keeps, per ``(conv_id, turn_idx)``, the
highest LSN seen so far and emits ONLY events that advance it. Stale
events (lower LSN than the state — they could never win LWW) and
duplicate deliveries are dropped at the stream stage, before they cost
a merge shuffle or delta-file bytes.

Semantics guarantee (tested): applying the filtered stream to a lake
table produces exactly the same final state as applying everything —
the filter removes only LWW losers. This is the streaming-native
pre-reduce for the CDC core: state size is O(live keys), Arrow-batched
per group, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import KEY_COLS

_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, lsn long, op string, role string, "
    "text string, tool string, ts timestamp, source_part int"
)
_STATE_SCHEMA = "max_lsn long"
_OUT_COLS = [
    "conv_id", "turn_idx", "lsn", "op", "role", "text", "tool", "ts",
    "source_part",
]


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    max_lsn = state.get[0] if state.exists else -1
    for pdf in pdfs:
        fresh = pdf[pdf["lsn"] > max_lsn]
        # duplicate delivery inside one micro-batch: identical rows share
        # an lsn — emit once
        fresh = fresh.drop_duplicates(subset=["lsn"])
        if len(fresh):
            # within the batch, only the winner matters downstream, but
            # emit every advancing event so lineage stays loss-free;
            # advance the watermark to the batch max
            max_lsn = int(fresh["lsn"].max())
            yield fresh[_OUT_COLS]
    state.update((max_lsn,))


def stateful_lsn_dedup(events: DataFrame) -> DataFrame:
    """Streaming transformation: drop per-key stale/duplicate events.

    ``events`` is a streaming DataFrame with the change-event schema;
    output has the same schema minus already-doomed rows. Null-key rows
    must be split off first (groupBy would conflate them)."""
    return events.groupBy(*KEY_COLS).applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
