"""Property-based projected reads: for ARBITRARY event streams —
inserts, updates, deletes, re-inserts and byte-identical duplicate
deliveries, applied across multiple merge batches — ``read(columns=C)``
must equal ``read().select(C)`` for every non-empty column subset C.

This pins the soundness argument in MiniLakeTable._fold: folding the
LWW winner over a payload SUBSET cannot change which row wins, because
LSNs are unique per key up to byte-identical duplicates (the ingest
contract), so the payload columns in the tie-break struct never decide
anything. Hypothesis searches the delivery schedules the unit tests
don't enumerate (same-key churn across batches, deletes straddling
batch boundaries, duplicates of the winner vs of a loser...)."""

from __future__ import annotations

import itertools
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA

KEYS = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool", "ts"]

# one event: (key, op, role?, text?) — lsn assigned by position, and a
# duplicate-delivery flag re-emits the SAME event (same lsn) verbatim
event_strategy = st.tuples(
    st.sampled_from([("a", 0), ("a", 1), ("b", 0)]),
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["user", "assistant", None]),
    st.sampled_from(["x", "yy", None]),
    st.booleans(),  # duplicate-deliver this event
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_strategy, min_size=1, max_size=10),
    n_batches=st.integers(1, 3),
)
def test_projected_read_equals_full_projection(
    spark, tmp_path_factory, events, n_batches
):
    tmp = tmp_path_factory.mktemp("proj")
    t = MiniLakeTable.create(
        spark, str(tmp / "t"), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=2, write_mode="mor",
    )
    rows = []
    for lsn, ((cid, tix), op, role, text, dup) in enumerate(events, 1):
        row = (
            (cid, tix, None, None, None, lsn, "D")
            if op == "D"
            else (cid, tix, role, text, None, lsn, op)
        )
        rows.append(row)
        if dup:
            rows.append(row)  # byte-identical duplicate delivery
    per_batch = max(1, len(rows) // n_batches)
    for b, start in enumerate(range(0, len(rows), per_batch)):
        t.merge(
            spark.createDataFrame(
                rows[start:start + per_batch],
                "conv_id string, turn_idx int, role string, text string, "
                "ts timestamp, lsn long, op string",
            ),
            batch_id=b,
        )

    full = t.read()
    for k in (1, 2):
        for sub in itertools.combinations(["role", "text", "conv_id"], k):
            cols = list(sub)
            got = Counter(
                tuple(r) for r in t.read(columns=cols).collect()
            )
            want = Counter(
                tuple(r) for r in full.select(*cols).collect()
            )
            assert got == want, (cols, got, want)
