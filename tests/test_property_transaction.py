"""Property test of the multi-table transaction state machine: for ANY
sequence of per-batch txns each crashed at ANY protocol point (or not
at all), followed by recovery, the final state is all-or-nothing per
txn — both tables hold exactly the batches of txns that passed their
commit point, applied exactly once, with no staged commits or txn
records left behind. Randomized analog of the directed crash tests in
test_transaction.py (same invariant the r5 racing-compaction stress
used to surface a real defect)."""

from __future__ import annotations

import glob
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_spark.lake.catalog import MiniLakeCatalog
from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.lake.transaction import pending_transactions

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)
STATS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), True),
    ]
)

# crash points: None = healthy commit; "drop" = crash before the commit
# point (txn object lost); k=1..2 = crash on the k-th publish (strictly
# after the commit point)
crash_strategy = st.lists(
    st.sampled_from([None, "drop", 1, 2]), min_size=1, max_size=3
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(crashes=crash_strategy)
def test_txn_all_or_nothing_under_any_crash_schedule(
    spark, tmp_path_factory, crashes
):
    tmp = tmp_path_factory.mktemp("txnprop")
    cat = MiniLakeCatalog.create(spark, str(tmp / "lake"))
    cat.create_table(
        "prod.t1", SCHEMA, key_cols=["conv_id", "turn_idx"],
        n_buckets=2, write_mode="mor",
    )
    cat.create_table(
        "prod.t2", STATS_SCHEMA, key_cols=["conv_id"], n_buckets=2,
        write_mode="mor", merge_engine="agg", agg_spec={"n_events": "sum"},
    )

    real = MiniLakeTable.publish_staged
    committed: set[int] = set()
    try:
        for b, crash in enumerate(crashes):
            rows = spark.createDataFrame(
                [(f"c{b}", i, f"t{b}-{i}", b * 10 + i + 1, "I")
                 for i in range(3)],
                "conv_id string, turn_idx int, text string, "
                "lsn long, op string",
            )
            stats = spark.createDataFrame(
                [(f"c{b}", 1, b * 10 + i + 1, "I") for i in range(3)],
                "conv_id string, n_events long, lsn long, op string",
            )
            txn = cat.transaction(txn_id=f"b{b}")
            txn.merge("prod.t1", rows, batch_id=b)
            txn.merge("prod.t2", stats, batch_id=b)
            if crash is None:
                txn.commit()
                committed.add(b)
            elif crash == "drop":
                del txn  # lost before the commit point
            else:
                calls = {"n": 0}

                def flaky(self, wap_id, _k=crash):
                    calls["n"] += 1
                    if calls["n"] == _k:
                        raise OSError("injected crash")
                    return real(self, wap_id)

                MiniLakeTable.publish_staged = flaky
                try:
                    with pytest.raises(OSError):
                        txn.commit()
                finally:
                    MiniLakeTable.publish_staged = real
                committed.add(b)  # past the commit point: must complete
            rep = cat.recover_transactions()
            assert not rep["pending"], rep
    finally:
        MiniLakeTable.publish_staged = real

    # all-or-nothing per txn, exactly once, on both tables
    t1 = cat.load_table("prod.t1").read()
    got_t1 = {
        r["conv_id"] for r in t1.select("conv_id").distinct().collect()
    }
    assert got_t1 == {f"c{b}" for b in committed}
    assert t1.count() == 3 * len(committed)
    t2 = {
        r["conv_id"]: r["n_events"]
        for r in cat.load_table("prod.t2").read().collect()
    }
    assert t2 == {f"c{b}": 3 for b in committed}
    assert pending_transactions(cat) == []
    assert glob.glob(
        os.path.join(cat.tables_dir, "*", "metadata", "staged", "*.json")
    ) == []
