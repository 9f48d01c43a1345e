"""Mini-driver: run every queries() entry against its oracle_sql() via
DuckDB at sf0.001 — the same comparison shape the external driver uses
(row count, column names, order-insensitive values). Catches engine/
oracle drift before the driver does."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("Int", "UInt", "int", "uint")):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    exp = _normalize(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for col in got.columns:
        for i, (a, b) in enumerate(zip(got[col], exp[col])):
            assert _values_equal(a, b), (
                f"{name}.{col}[{i}]: spark={a!r} oracle={b!r}"
            )


ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLES))


@pytest.mark.skipif(
    not ROWS_ONLY,
    reason="all registry queries carry a full DuckDB oracle — there are "
    "no rows-only entries left to smoke-check (this is the good case)",
)
@pytest.mark.parametrize("name", ROWS_ONLY or ["<none>"])
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


# The external driver grades the FIRST 50 registry entries; the order is
# therefore part of the grading contract. Pin the intended round-4
# window so an accidental registry edit can't silently rotate queries in
# or out of the driver's view (ADVICE r3).
# RULE (since r5): any NEW registry query ships INSIDE this window in
# the same commit that adds it — the driver grades only the first 50,
# and three rounds running, queries added mid-round missed their grading
# round. Entries may rotate below the line only once driver-green.
INTENDED_FIRST_50 = [
    "cdc_engine_replay", "cdc_time_travel", "cdc_incremental_changes",
    "cdc_lineage_stats", "cdc_lww_state", "cdc_dead_letter_split",
    "cdc_schema_evolution", "cdc_role_transitions",
    "cdc_replicated_state", "cdc_conv_stats_mv", "cdc_rescaled_state",
    "cdc_dead_letter_feed", "cdc_wap_publish", "cdc_tagged_state",
    "cdc_requeue_state", "cdc_branch_state", "cdc_renamed_state",
    "cdc_files_metadata", "cdc_scd2_history", "cdc_net_changes",
    "cdc_partial_update_state", "cdc_conv_agg_state",
    "cdc_default_values", "cdc_widened_state", "cdc_constrained_state",
    "cdc_dml_state", "cdc_merge_into_state", "cdc_overwrite_state",
    "cdc_txn_state", "cdc_purged_state",
    "cdc_ts_range_scan", "cdc_zorder_scan",
    "cdc_stream_changes", "cdc_clone_state", "cdc_row_lineage",
    "cdc_expired_state", "cdc_table_stats_check", "cdc_net_envelope",
    "cdc_masked_state", "cdc_profile_drift", "cdc_sanitized_replica",
    "brand_revenue_promo_share", "events_approx_quantiles_check",
    "cdc_rollback_state", "mm_features", "docs_minhash_near_dups",
    "docs_simhash_groups", "docs_simhash_near_dups",
    "docs_simhash_pairs_editdist", "docs_containment",
    # docs_winnow_fingerprints moved below the line for the r5
    # session-9 insertion of cdc_sanitized_replica — allowed: green r04
    # (500 rows).
    # docs_dup_clusters and docs_sentence_dedup moved below the line
    # for the r5 session-9 insertions of cdc_masked_state and
    # cdc_profile_drift — allowed: both green r04 (360 / 2 rows).
    # docs_stratified_sample and docs_boilerplate moved below the line
    # for the r5 session-8 insertions of cdc_txn_state and
    # cdc_purged_state — allowed: both green r04 (60 / 500 rows).
    # docs_repetition_stats and docs_unigram_entropy moved below the
    # line for the r5 session-7 insertions of cdc_merge_into_state and
    # cdc_overwrite_state — allowed: both green r04 (500 rows each).
    # docs_dedup_then_sample, docs_quality_percentile_filter,
    # docs_tfidf_top_terms and docs_pii_redaction moved below the line
    # for the r5 session-6 insertions of cdc_row_lineage,
    # cdc_expired_state, cdc_table_stats_check and cdc_net_envelope —
    # allowed: all green r04 (60/450/500/500 rows).
    # docs_bpe_token_stats, docs_exact_dup_pairs and mm_frame_sample
    # moved below the line for the r5 session-5 insertions of
    # cdc_clone_state, cdc_stream_changes and cdc_zorder_scan —
    # allowed: green r04 (500, 72 and 2000 rows).
    # emb_label_stats moved below the line for the r5 session-4
    # insertion of cdc_ts_range_scan — allowed: green r04 (26 rows).
    # emb_near_dup_pairs, user_event_paths, user_event_paths_jvm and
    # events_last_value_per_user moved below the line for the r5
    # session-3 insertions of cdc_default_values, cdc_widened_state,
    # cdc_constrained_state and cdc_dml_state — allowed: all green r04.
    # customers_without_big_orders, customers_with_orders and
    # hourly_view_vs_purchase moved below the line for the r5 session-2
    # insertions of cdc_scd2_history, cdc_net_changes and
    # cdc_partial_update_state — allowed: all three green r04.
    # customer_spend_deciles moved below the line for the r5 insertion of
    # cdc_rescaled_state — allowed: it has a green driver row (r02).
    # orders_price_histogram and lineitem_stats_profile moved below the
    # line for the r5 insertions of cdc_wap_publish and cdc_tagged_state
    # — allowed: both have green driver rows (r03, r04).
    # events_session_windows, events_approx_distinct_check,
    # events_salted_join and events_user_value_salted moved below the
    # line for the r5 insertions of cdc_requeue_state, cdc_branch_state,
    # cdc_renamed_state and cdc_files_metadata — allowed: all four have
    # green driver rows (r03, r04)
]


def test_driver_window_is_the_intended_first_50():
    assert list(ALL_QUERIES)[:50] == INTENDED_FIRST_50


def test_query_caches_keyed_on_application_id(spark):
    """The replayed-table caches must key on applicationId, not
    id(spark) — a GC'd session's id can be reused by a fresh one, which
    would serve a stale table handle (r3 verdict)."""
    from etl_pipeline_spark import queries as Q

    t1 = Q._replayed_table(spark, SF_DIR)
    t2 = Q._replayed_table(spark, SF_DIR)
    assert t1 is t2  # cache hit
    app_id = spark.sparkContext.applicationId
    assert (app_id, SF_DIR) in Q._REPLAY_CACHE
    assert all(isinstance(k[0], str) for k in Q._REPLAY_CACHE)
