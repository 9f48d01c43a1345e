"""Property-based streaming table source: ARBITRARY interleavings of
merges (inserts / updates / deletes, varied sizes) and maintenance
(compaction with and without tombstone drops) must keep the stream
identical to the batch change feed — both for the full history and for
a random mid-history ``startingVersion``.

Hypothesis searches the interleavings the unit tests don't enumerate
(delete-then-compact-then-reinsert, back-to-back compactions, empty
effective spans). Each example drains the feed with one availableNow
pass into a parquet sink; the invariant is exact multiset equality with
``read_changes_since`` over the same version span.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA_V0
from etl_pipeline_spark.streaming.table_source import register

KEYS = ["conv_id", "turn_idx"]

op_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("merge"),
            st.lists(
                st.tuples(
                    st.sampled_from(["a", "b", "c", "d", "e"]),  # key
                    st.sampled_from(["U", "I", "D"]),            # op
                ),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(st.just("compact"), st.booleans()),  # drop_tombstones
    ),
    min_size=1,
    max_size=6,
)


def _drain(spark, root, out_dir, ckpt, starting):
    register(spark)
    q = (
        spark.readStream.format("minilake_changes")
        .option("path", root)
        .option("startingVersion", str(starting))
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=op_strategy, start_frac=st.floats(0.0, 1.0))
def test_stream_matches_batch_for_any_interleaving(
    spark, tmp_path_factory, ops, start_frac
):
    tmp = tmp_path_factory.mktemp("prop_src")
    t = MiniLakeTable.create(
        spark,
        str(tmp / "t"),
        TRANSCRIPT_SCHEMA_V0,
        key_cols=KEYS,
        n_buckets=4,
        write_mode="mor",
    )
    lsn = 0
    batch = 0
    for op in ops:
        if op[0] == "compact":
            t.compact(drop_tombstones=op[1])
            continue
        rows = []
        for key, kind in op[1]:
            lsn += 1
            rows.append(
                (
                    key, 0, "user", f"{key}-{lsn}",
                    datetime.datetime(2024, 1, 1, lsn % 24), lsn, kind,
                )
            )
        t.merge(
            spark.createDataFrame(
                rows,
                "conv_id string, turn_idx int, role string, text string, "
                "ts timestamp, lsn long, op string",
            ),
            batch_id=batch,
        )
        batch += 1
    cur = t.current_version()
    start = 1 + int(start_frac * (cur - 1))  # any retained version
    out, ckpt = str(tmp / "out"), str(tmp / "ckpt")
    _drain(spark, t.root, out, ckpt, start)
    try:
        got = sorted(
            map(
                tuple,
                spark.read.parquet(out).drop("_commit_version").collect(),
            )
        )
    except Exception:
        got = []  # empty span: the sink dir may not exist
    want = sorted(map(tuple, t.read_changes_since(start).collect()))
    assert got == want
