"""Replication chain: primary table → exported changelog → replica
table. The replica must converge to the primary's exact live state,
including deletes (tombstones travel as op='D'), both for a full export
and for incremental exports across resumed ingest."""

from __future__ import annotations

import pandas as pd

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.lake.replicate import export_changes
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
from etl_pipeline_spark.sources.genlog import GenConfig, write_changelog
from etl_pipeline_spark.streaming.ingest import replay_files

KEYS = ["conv_id", "turn_idx"]


def _mor(spark, root):
    return MiniLakeTable.create(
        spark, str(root), TRANSCRIPT_SCHEMA, key_cols=KEYS,
        n_buckets=8, write_mode="mor",
    )


def _state(table) -> pd.DataFrame:
    pdf = table.read().toPandas().sort_values(KEYS).reset_index(drop=True)
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    return pdf[cols].astype(object).where(pdf[cols].notna(), None)


def test_full_export_replicates_state(spark, tmp_path):
    cfg = GenConfig(
        n_events=6_000, batch_size=1_000, dup_delivery_rate=0.02,
        shuffle_window=200,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    replay_files(spark, clog, primary)

    out = str(tmp_path / "export")
    path = export_changes(primary, out)
    assert path is not None

    replica = _mor(spark, tmp_path / "replica")
    replay_files(spark, out, replica)
    assert _state(replica).equals(_state(primary))
    # deletes replicated: same tombstoned keys gone on both sides
    assert replica.read().count() == primary.read().count()


def test_incremental_export_resumes(spark, tmp_path):
    cfg = GenConfig(n_events=6_000, batch_size=1_000, shuffle_window=100)
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    out = str(tmp_path / "export")
    replica = _mor(spark, tmp_path / "replica")

    # first half lands; export + replicate
    replay_files(spark, clog, primary, stop_after=3)
    v1 = primary.current_version()
    assert export_changes(primary, out, batch_index=0) is not None
    replay_files(spark, out, replica)

    # primary resumes; incremental export of only the new versions
    replay_files(spark, clog, primary)
    assert export_changes(
        primary, out, from_version=v1, batch_index=1
    ) is not None
    replay_files(spark, out, replica)  # batch 0 fenced, batch 1 applied

    assert _state(replica).equals(_state(primary))

    # nothing new → no phantom batch
    assert export_changes(
        primary, out, from_version=primary.current_version(), batch_index=2
    ) is None


def test_replication_is_idempotent(spark, tmp_path):
    """Re-ingesting the same export (operator retry) must be a no-op:
    fences skip the duplicate batch; even under a different grouping the
    LWW lsn semantics keep the state identical."""
    cfg = GenConfig(n_events=3_000, batch_size=1_000)
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    replay_files(spark, clog, primary)
    out = str(tmp_path / "export")
    export_changes(primary, out)
    replica = _mor(spark, tmp_path / "replica")
    replay_files(spark, out, replica)
    before = _state(replica)
    replay_files(spark, out, replica)  # same stream id → fenced no-op
    replay_files(spark, out, replica, files_per_batch=2)  # new grouping
    assert _state(replica).equals(before)
