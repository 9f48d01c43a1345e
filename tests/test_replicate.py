"""Replication chain: primary table → exported changelog → replica
table. The replica must converge to the primary's exact live state,
including deletes (tombstones travel as op='D'), both for a full export
and for incremental exports across resumed ingest."""

from __future__ import annotations

import pandas as pd

import pytest

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.lake.replicate import export_changes, export_snapshot
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


# --- disorder: out-of-order / duplicate export application ---------------

_TS = pd.Timestamp("2026-01-01")


def _events(rows) -> pd.DataFrame:
    """rows: (lsn, op, conv, turn, text). Fills the remaining change-event
    columns with deterministic values."""
    df = pd.DataFrame(
        [
            {
                "lsn": lsn, "op": op, "conv_id": conv, "turn_idx": turn,
                "role": "user", "text": text, "tool": None,
                "ts": _TS + pd.Timedelta(seconds=lsn), "source_part": 0,
            }
            for lsn, op, conv, turn, text in rows
        ]
    )
    # Spark's parquet reader rejects pandas' default TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def _write_manual_batch(df: pd.DataFrame, dir_path, name="batch-000000.parquet"):
    dir_path.mkdir(parents=True, exist_ok=True)
    df.to_parquet(str(dir_path / name), index=False)


def test_out_of_order_and_duplicate_batches_converge(spark, tmp_path):
    """Replication's order-insensitivity claim, graded: export batches
    applied to the replica out of order AND twice must converge to the
    primary's LWW state — including a tombstone (high lsn D) applied
    BEFORE a stale U (lower lsn) that must not resurrect the key."""
    # three primary ingest stages; key ("c2", 0) is updated in stage 1
    # (lsn 4) then deleted in stage 2 (lsn 5) — applying stage 2's export
    # before stage 1's exercises exactly the stale-U-after-D hazard.
    stages = [
        _events([(1, "I", "c1", 0, "a"), (2, "I", "c2", 0, "b")]),
        _events([(3, "U", "c1", 0, "a2"), (4, "U", "c2", 0, "b-stale")]),
        _events([(5, "D", "c2", 0, None), (6, "U", "c1", 0, "a3")]),
    ]
    clog = tmp_path / "clog"
    for i, df in enumerate(stages):
        _write_manual_batch(df, clog, f"batch-{i:06d}.parquet")

    primary = _mor(spark, tmp_path / "primary")
    exports = []
    for i in range(3):
        from_v = primary.current_version()
        replay_files(spark, str(clog), primary, stop_after=1,
                     start_batch=i)
        out = str(tmp_path / f"export{i}")  # own dir => own fence stream
        assert export_changes(primary, out, from_version=from_v) is not None
        exports.append(out)

    replica = _mor(spark, tmp_path / "replica")
    # stage 2 (the delete) first, then the stale stage 1, then stage 0,
    # then both early stages AGAIN (operator retry)
    for out in [exports[2], exports[1], exports[0], exports[1], exports[0]]:
        replay_files(spark, out, replica)

    assert _state(replica).equals(_state(primary))
    live = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in replica.read().collect()
    }
    assert live == {("c1", 0, "a3")}  # c2 stayed deleted; c1 at lsn 6
    tombs = {
        (r["conv_id"], r["turn_idx"], r["_lsn"])
        for r in replica.read_tombstones().collect()
    }
    assert ("c2", 0, 5) in tombs  # the delete is a physical tombstone


# --- retention horizon × replication chain -------------------------------


def test_export_past_retention_horizon_raises(spark, tmp_path):
    cfg = GenConfig(n_events=5_000, batch_size=500)  # 10 versions
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    replay_files(spark, clog, primary)
    primary.expire_snapshots(keep_last=2)

    with pytest.raises(ValueError, match="retention"):
        export_changes(primary, str(tmp_path / "out"), from_version=1)
    # the implicit full export anchors on v1 too — same clear failure,
    # pointing the operator at the snapshot re-seed path
    with pytest.raises(ValueError, match="retention"):
        export_changes(primary, str(tmp_path / "out"))


def test_snapshot_reseed_converges_stale_replica(spark, tmp_path):
    """The documented recovery: a replica that fell behind the primary's
    retention horizon re-seeds from export_snapshot and converges —
    including keys the primary deleted AFTER the replica's last applied
    export (they must vanish on the replica, via snapshot tombstones)."""
    cfg = GenConfig(
        n_events=6_000, batch_size=500, op_mix=(0.5, 0.3, 0.2), seed=7,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    replica = _mor(spark, tmp_path / "replica")

    # replica applies an early export, then falls behind
    replay_files(spark, clog, primary, stop_after=3)
    assert export_changes(primary, str(tmp_path / "e0")) is not None
    replay_files(spark, str(tmp_path / "e0"), replica)

    # primary advances 9 more versions and GC drops the replica's anchor
    replay_files(spark, clog, primary)
    stale_anchor = 4
    primary.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="retention"):
        export_changes(
            primary, str(tmp_path / "e1"), from_version=stale_anchor
        )

    # re-seed: snapshot export onto the SAME (stale) replica
    assert export_snapshot(primary, str(tmp_path / "seed")) is not None
    replay_files(spark, str(tmp_path / "seed"), replica)
    assert _state(replica).equals(_state(primary))
    # deletes arrived as tombstones, not silent absences
    assert replica.read_tombstones().count() > 0
    # and the chain resumes incrementally from the snapshot's version
    v = primary.current_version()
    assert export_changes(
        primary, str(tmp_path / "e2"), from_version=v, batch_index=0
    ) is None  # nothing new yet — no phantom batch


def test_purge_then_replica_purge_and_reseed_converges(spark, tmp_path):
    """Purge × replication interplay. A primary purge (a) expires
    history, so the replica's next incremental export raises the
    behind-horizon error, and (b) drops the purged keys' tombstones, so
    a snapshot re-seed ALONE cannot delete them on a replica that
    already has them (no event exists to overwrite). The documented
    operational sequence — run the SAME purge on the replica, then
    re-seed from the snapshot — must converge both live state and
    physical erasure."""
    import glob
    import os

    cfg = GenConfig(n_events=6_000, batch_size=1_000, shuffle_window=100)
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    out = str(tmp_path / "export")
    replica = _mor(spark, tmp_path / "replica")

    replay_files(spark, clog, primary)
    v1 = primary.current_version()
    assert export_changes(primary, out, batch_index=0) is not None
    replay_files(spark, out, replica)

    victim = primary.read().select("conv_id").first()["conv_id"]
    pred = f"conv_id = '{victim}'"
    rep = primary.purge_where(pred, orphan_min_age_s=0)
    assert rep["verified"]

    # (a) the replica's incremental watermark fell behind the purge
    with pytest.raises(ValueError):
        export_changes(primary, out, from_version=v1, batch_index=1)

    # (b) snapshot re-seed alone leaves the purged rows on the replica
    # — the primary has no tombstones for them to replay
    seed_only = _mor(spark, tmp_path / "seed_only")
    replay_files(spark, out, seed_only)  # same pre-purge state
    out2 = str(tmp_path / "export2")
    assert export_snapshot(primary, out2, batch_index=0) is not None
    replay_files(spark, out2, seed_only)
    assert seed_only.read().filter(pred).count() > 0  # the gap, pinned

    # the documented sequence: replica purges the same predicate, then
    # re-seeds — live state AND physical bytes converge
    assert replica.purge_where(pred, orphan_min_age_s=0)["verified"]
    out3 = str(tmp_path / "export3")
    assert export_snapshot(primary, out3, batch_index=0) is not None
    replay_files(spark, out3, replica)
    assert _state(replica).equals(_state(primary))
    leak = 0
    for p in glob.glob(os.path.join(replica.meta_dir, "v*.json")):
        v = int(os.path.basename(p)[1:-5])
        leak += replica.read_physical(version=v).filter(pred).count()
    assert leak == 0


def test_sanitized_export_builds_masked_replica(spark, tmp_path):
    """apply_masks=True: the replica in the less-trusted environment
    never receives a raw value — its state equals the primary's masked
    view (column masks only; the row filter must be re-bound on the
    replica, pinned in tests/test_masking.py). Covers incremental
    exports across a delete so tombstones ride the sanitized feed."""
    from etl_pipeline_spark.lake.masking import (
        read_masked,
        set_masking_policy,
    )

    cfg = GenConfig(
        n_events=4_000, batch_size=1_000, dup_delivery_rate=0.02,
        shuffle_window=200,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)
    primary = _mor(spark, tmp_path / "primary")
    replay_files(spark, clog, primary, stop_after=2)
    set_masking_policy(primary, "text", "hash")
    set_masking_policy(primary, "role", "null")

    out = str(tmp_path / "export")
    replica = _mor(spark, tmp_path / "replica")
    path = export_changes(primary, out, apply_masks=True)
    assert path is not None
    v1 = primary.current_version()
    replay_files(spark, out, replica)

    # resume the primary, export incrementally (sanitized), re-ingest
    replay_files(spark, clog, primary)
    assert export_changes(
        primary, out, from_version=v1, batch_index=1, apply_masks=True
    ) is not None
    replay_files(spark, out, replica)

    masked = read_masked(primary).toPandas().sort_values(KEYS)
    got = replica.read().toPandas().sort_values(KEYS)
    cols = ["conv_id", "turn_idx", "role", "text"]
    a = masked[cols].astype(object).where(masked[cols].notna(), None)
    b = got[cols].astype(object).where(got[cols].notna(), None)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # the sanitized feed carried no raw text anywhere
    assert got["text"].dropna().map(len).eq(32).all()
    assert got["role"].isna().all()

    # sanitized RE-SEED (the retention-horizon recovery path): a fresh
    # replica seeded from the masked snapshot equals the same view
    from etl_pipeline_spark.lake.replicate import export_snapshot

    out2 = str(tmp_path / "seed")
    assert export_snapshot(primary, out2, apply_masks=True) is not None
    reseeded = _mor(spark, tmp_path / "replica2")
    replay_files(spark, out2, reseeded)
    c = reseeded.read().toPandas().sort_values(KEYS)
    c2 = c[cols].astype(object).where(c[cols].notna(), None)
    assert a.reset_index(drop=True).equals(c2.reset_index(drop=True))


def test_sanitized_export_rejects_schema_breaking_masks(spark, tmp_path):
    from etl_pipeline_spark.lake.masking import set_masking_policy

    primary = _mor(spark, tmp_path / "primary")
    primary.merge(
        spark.createDataFrame(
            [("a", 0, "user", "x", None, 1, "I")],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=0,
    )
    set_masking_policy(primary, "ts", "hash")
    with pytest.raises(ValueError, match="non-string column 'ts'"):
        export_changes(
            primary, str(tmp_path / "out"), apply_masks=True
        )


def test_sanitized_export_rejects_non_injective_key_masks(spark, tmp_path):
    """'redact_pii' on a key collapses distinct PII-valued keys to one
    placeholder — the replica's LWW fold would silently merge source
    rows. Only the injective-enough 'hash' mask is allowed on keys."""
    from etl_pipeline_spark.lake.masking import set_masking_policy

    primary = _mor(spark, tmp_path / "primary")
    primary.merge(
        spark.createDataFrame(
            [("a@x.com", 0, "user", "x", None, 1, "I")],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, lsn long, op string",
        ),
        batch_id=0,
    )
    set_masking_policy(primary, "conv_id", "redact_pii")
    with pytest.raises(ValueError, match="non-injective key masks"):
        export_changes(primary, str(tmp_path / "o"), apply_masks=True)
    # hash on the key pseudonymizes consistently and is allowed
    set_masking_policy(primary, "conv_id", "hash")
    assert export_changes(
        primary, str(tmp_path / "o2"), apply_masks=True
    ) is not None
