"""The declared ``user_event_paths`` query now runs the pure-JVM
``sort_array(collect_list(...))`` formulation (8× faster than grouped-map
Arrow at sf0.1 — per-group pandas dispatch dominated at ~120 rows/group).
This pins that the retained Arrow formulation still computes the exact
same result, so the swap is an implementation change, not a semantic one.
"""

from __future__ import annotations

import os

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_arrow_and_jvm_paths_identical(spark):
    from etl_pipeline_spark.queries import (
        q_user_event_paths,
        user_event_paths_arrow,
    )

    jvm = {
        (r["user_id"], r["n_events"], r["path"])
        for r in q_user_event_paths(spark, SF_DIR).collect()
    }
    arrow = {
        (r["user_id"], r["n_events"], r["path"])
        for r in user_event_paths_arrow(spark, SF_DIR).collect()
    }
    assert jvm == arrow and len(jvm) > 0
