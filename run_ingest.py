"""CLI ingest driver — the spark-submit entrypoint.

    spark-submit --py-files engine.zip run_ingest.py \\
        --changelog /data/changelog --table /lake/transcripts \\
        --checkpoint /ckpt/transcripts --mode stream

    # bounded replay (no Structured Streaming checkpoint; the lake's
    # fence IS the checkpoint):
    python run_ingest.py --changelog ... --table ... --mode replay

Creates the table if missing (merge-on-read by default), runs the
ingest, prints per-batch lineage throughput at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changelog", default=None)
    ap.add_argument("--table", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--mode",
        choices=[
            "stream", "evolving-stream", "replay", "export",
            "requeue", "publish-branch", "audit", "expire", "analyze",
            "purge", "recover-txns", "drift", "mask", "row-filter",
            "compact", "gc",
        ],
        default="stream",
        help="stream: fixed superset read schema; evolving-stream: "
        "per-run Parquet-footer schema reconciliation plus in-trigger "
        "restart-on-widen (true in-flight column birth); replay: "
        "bounded ordered-file replay, per-batch schema inference; "
        "export: CDC-out — write the table's changes since "
        "--from-version as a changelog batch (--out) a downstream "
        "replica ingests with any other mode; requeue: repair-and-replay "
        "the table's dead-letter quarantine through the same pipeline "
        "(as-is retry — rows dead-lettered for a since-fixed cause, e.g. "
        "a schema that has since evolved; still-bad rows re-quarantine); "
        "publish-branch: fast-forward --branch onto main (falls back to "
        "cherry-pick when main advanced past the divergence); "
        "audit: integrity fsck at --audit-level, nonzero exit on "
        "findings; expire: row retention TTL — drop rows with "
        "--expire-col below --older-than as metadata file drops; "
        "analyze: store per-column NDV sketches + null counts in the "
        "manifest (Puffin analog); purge: right-to-be-forgotten — "
        "hard-delete every physical row matching --where from every "
        "readable snapshot, verified; recover-txns: resolve pending "
        "multi-table transactions in --catalog (prepared→abort, "
        "committed→roll forward); drift: per-column row/NDV/null deltas "
        "between --from-version and --to-version (--drift-mode stats is "
        "the zero-scan path over stored ANALYZE manifests); mask: bind "
        "--mask-kind to --column (none drops the policy); row-filter: "
        "bind --where as the row-access predicate (omit to drop); "
        "compact: fold delta chains into fresh key-sorted files "
        "(--cluster-cols re-targets the layout at range scans, --zorder "
        "at multi-dimensional boxes); gc: retention — expire snapshots "
        "older than the newest --keep-last and delete unreferenced dirs",
    )
    ap.add_argument(
        "--audit-level", choices=["metadata", "files", "data"],
        default="files",
    )
    ap.add_argument(
        "--where", default=None,
        help="purge mode: SQL predicate selecting the physical rows to "
        "hard-delete from every readable snapshot",
    )
    ap.add_argument("--expire-col", default="ts")
    ap.add_argument(
        "--older-than", default=None,
        help="expire mode: ISO timestamp/date or number (typed per "
        "--expire-col)",
    )
    ap.add_argument(
        "--analyze-columns", default=None,
        help="analyze mode: comma-separated columns (default: all)",
    )
    ap.add_argument(
        "--catalog", default=None,
        help="resolve --table as a catalog identifier "
        "('namespace.table') against this catalog root instead of a "
        "filesystem path; ingest modes create the table in the catalog "
        "if missing",
    )
    ap.add_argument(
        "--to-branch", default=None,
        help="replay mode: audited backfill — write every batch to this "
        "branch ref (created at the current snapshot if missing); main "
        "serves the old state until publish-branch",
    )
    ap.add_argument(
        "--branch", default=None, help="publish-branch mode: branch name"
    )
    ap.add_argument("--out", default=None, help="export mode: output dir")
    ap.add_argument(
        "--to-version", type=int, default=None,
        help="drift mode: end snapshot (default: current)",
    )
    ap.add_argument(
        "--drift-mode", choices=["exact", "stats"], default="exact",
        help="drift mode: exact recompute (audit) or zero-scan diff of "
        "stored ANALYZE manifests",
    )
    ap.add_argument(
        "--max-rows-delta-pct", type=float, default=None,
        help="drift mode: gate — fail (exit 1) when |rows delta| "
        "exceeds this fraction of the from-side",
    )
    ap.add_argument(
        "--max-ndv-delta-pct", type=float, default=None,
        help="drift mode: gate on per-column NDV delta",
    )
    ap.add_argument(
        "--max-nulls-delta-pct", type=float, default=None,
        help="drift mode: gate on per-column null-count delta",
    )
    ap.add_argument(
        "--forbid-schema-changes", action="store_true",
        help="drift mode: gate — any schema change between the two "
        "snapshots is a finding",
    )
    ap.add_argument("--column", default=None, help="mask mode: column")
    ap.add_argument(
        "--cluster-cols", default=None,
        help="compact mode: comma-separated range-layout columns",
    )
    ap.add_argument(
        "--zorder", action="store_true",
        help="compact mode: z-order the clustered columns",
    )
    ap.add_argument(
        "--target-rows-per-file", type=int, default=8_000_000,
        help="compact mode: range-split size",
    )
    ap.add_argument(
        "--keep-tombstones", action="store_true",
        help="compact mode: retain tombstone rows (default drops them)",
    )
    ap.add_argument(
        "--keep-last", type=int, default=10,
        help="gc mode: number of newest snapshots to retain",
    )
    ap.add_argument(
        "--orphan-min-age-s", type=float, default=86400.0,
        help="gc mode: minimum age before an unreferenced dir is deleted",
    )
    ap.add_argument(
        "--mask-kind",
        choices=["redact_pii", "hash", "null", "none"],
        default=None,
        help="mask mode: policy to bind ('none' drops the policy)",
    )
    ap.add_argument(
        "--from-version", type=int, default=None,
        help="export mode: last source version already exported "
        "(default: full export since table creation)",
    )
    ap.add_argument(
        "--snapshot", action="store_true",
        help="export mode: re-seed export — the current resolved state "
        "(live rows as U, tombstones as D, winning lsn kept) as one "
        "batch; the recovery path when --from-version fell behind the "
        "retention horizon",
    )
    ap.add_argument(
        "--apply-masks", action="store_true",
        help="export mode: sanitized feed — the table's masking "
        "policies applied to every change event (lww tables; the row "
        "filter must be re-bound on the replica)",
    )
    ap.add_argument("--batch-index", type=int, default=0)
    ap.add_argument("--write-mode", choices=["mor", "cow"], default="mor")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument("--lineage-level", choices=["full", "batch"], default="full")
    ap.add_argument(
        "--pipeline-depth", type=int, default=1,
        help="replay mode, MOR tables: overlap up to N batches "
        "(commits stay batch-ordered)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from etl_pipeline_spark.lake.lineage import LineageLog
    from etl_pipeline_spark.lake.minilake import MiniLakeTable
    from etl_pipeline_spark.pipeline import ApplyConfig
    from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
    from etl_pipeline_spark.session import get_spark
    from etl_pipeline_spark.streaming.ingest import (
        replay_files,
        run_ingest_stream,
        run_ingest_stream_evolving,
    )

    spark = get_spark("etl-ingest", master=args.master)
    if args.mode == "recover-txns":
        if args.catalog is None:
            ap.error("--mode recover-txns requires --catalog")
        from etl_pipeline_spark.lake.catalog import MiniLakeCatalog

        rep = MiniLakeCatalog.create(spark, args.catalog) \
            .recover_transactions()
        print(json.dumps(rep))
        # a committed txn that cannot roll forward is an operator page
        sys.exit(0 if not rep["pending"] else 1)

    if args.table is None:
        ap.error(f"--mode {args.mode} requires --table")
    maintenance = args.mode in (
        "audit", "expire", "analyze", "export", "requeue",
        "publish-branch", "purge", "drift", "mask", "row-filter",
        "compact", "gc",
    )
    if args.catalog is not None:
        from etl_pipeline_spark.lake.catalog import MiniLakeCatalog

        cat = MiniLakeCatalog.create(spark, args.catalog)
        if cat.table_exists(args.table):
            table = cat.load_table(args.table)
        elif maintenance:
            # maintenance/egress verbs operate on an EXISTING table
            ap.error(
                f"--mode {args.mode}: no table {args.table!r} in the "
                f"catalog at {args.catalog}"
            )
            return  # unreachable; ap.error exits
        else:
            table = cat.create_table(
                args.table,
                TRANSCRIPT_SCHEMA,
                key_cols=["conv_id", "turn_idx"],
                n_buckets=args.n_buckets,
                write_mode=args.write_mode,
            )
    elif MiniLakeTable.exists(args.table):
        table = MiniLakeTable(spark, args.table)
    elif maintenance:
        # maintenance/egress verbs operate on an EXISTING table — auto-
        # creating an empty one here would let a typo'd --table path
        # produce a green fsck (or a junk table) against nothing
        ap.error(f"--mode {args.mode}: no table at {args.table}")
        return  # unreachable; ap.error exits
    else:
        table = MiniLakeTable.create(
            spark,
            args.table,
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            n_buckets=args.n_buckets,
            write_mode=args.write_mode,
        )

    if args.mode == "export":
        if not args.out:
            ap.error("--mode export requires --out")
        from etl_pipeline_spark.lake.replicate import (
            export_changes,
            export_snapshot,
        )

        if args.snapshot:
            path = export_snapshot(
                table, args.out, batch_index=args.batch_index,
                apply_masks=args.apply_masks,
            )
        else:
            path = export_changes(
                table, args.out,
                from_version=args.from_version, batch_index=args.batch_index,
                apply_masks=args.apply_masks,
            )
        print(
            json.dumps(
                {
                    "exported_batch": path,
                    "source_version": table.current_version(),
                }
            )
        )
        return

    if args.mode == "publish-branch":
        if not args.branch:
            ap.error("--mode publish-branch requires --branch")
        from etl_pipeline_spark.lake.minilake import CommitConflict

        try:
            results = table.fast_forward(args.branch)
            how = "fast-forward"
        except CommitConflict:
            results = table.cherry_pick_branch(args.branch)
            how = "cherry-pick"
        print(
            json.dumps(
                {
                    "published": how,
                    "commits": len(results),
                    "fenced_dropped": sum(1 for r in results if r.skipped),
                    "final_version": table.current_version(),
                }
            )
        )
        return

    if args.mode == "audit":
        from etl_pipeline_spark.lake.audit import audit_table

        rep = audit_table(table, level=args.audit_level)
        print(json.dumps(rep))
        sys.exit(0 if rep["ok"] else 1)

    if args.mode == "expire":
        if args.older_than is None:
            ap.error("--mode expire requires --older-than")
        from etl_pipeline_spark.schema import schema_from_manifest

        schema = schema_from_manifest(table.manifest()["schema"])
        dtype = next(
            (f.dataType for f in schema.fields
             if f.name == args.expire_col), None
        )
        cutoff: object = args.older_than
        if dtype is not None and dtype.simpleString() in (
            "timestamp", "date",
        ):
            import datetime as _dt

            cutoff = (
                _dt.datetime.fromisoformat(args.older_than)
                if dtype.simpleString() == "timestamp"
                else _dt.date.fromisoformat(args.older_than)
            )
        else:
            try:
                cutoff = (
                    int(args.older_than)
                    if "." not in args.older_than
                    else float(args.older_than)
                )
            except ValueError:
                pass  # string column: compare as-is
        res = table.expire_rows(args.expire_col, cutoff)
        print(json.dumps(res))
        return

    if args.mode == "purge":
        if args.where is None:
            ap.error("--mode purge requires --where")
        rep = table.purge_where(args.where)
        print(json.dumps(rep))
        return

    if args.mode == "compact":
        cluster = (
            [c.strip() for c in args.cluster_cols.split(",")]
            if args.cluster_cols
            else None
        )
        v = table.compact(
            drop_tombstones=not args.keep_tombstones,
            target_rows_per_file=args.target_rows_per_file,
            cluster_cols=cluster,
            zorder=args.zorder,
        )
        files = table.inspect_files().count()
        print(
            json.dumps(
                {"version": v, "files": files, "cluster_cols": cluster,
                 "zorder": args.zorder}
            )
        )
        return

    if args.mode == "gc":
        rep = table.expire_snapshots(
            keep_last=args.keep_last,
            orphan_min_age_s=args.orphan_min_age_s,
        )
        print(json.dumps(rep))
        return

    if args.mode == "drift":
        if args.from_version is None:
            ap.error("--mode drift requires --from-version")
        from etl_pipeline_spark.lake.monitor import (
            check_drift,
            profile_drift,
        )

        cols = (
            [c.strip() for c in args.analyze_columns.split(",")]
            if args.analyze_columns
            else None
        )
        gated = args.forbid_schema_changes or any(
            t is not None
            for t in (args.max_rows_delta_pct, args.max_ndv_delta_pct,
                      args.max_nulls_delta_pct)
        )
        head = {
            "from_version": args.from_version,
            "to_version": (
                args.to_version
                if args.to_version is not None
                else table.current_version()
            ),
            "mode": args.drift_mode,
        }
        if gated:
            # the monitoring GATE: audit-style findings + exit code
            rep = check_drift(
                table, v_from=args.from_version, v_to=args.to_version,
                columns=cols, mode=args.drift_mode,
                max_rows_delta_pct=args.max_rows_delta_pct,
                max_ndv_delta_pct=args.max_ndv_delta_pct,
                max_nulls_delta_pct=args.max_nulls_delta_pct,
                forbid_schema_changes=args.forbid_schema_changes,
            )
            print(json.dumps({**head, **rep}))
            sys.exit(0 if rep["ok"] else 1)
        df = profile_drift(
            table, v_from=args.from_version, v_to=args.to_version,
            columns=cols, mode=args.drift_mode,
        )
        print(
            json.dumps(
                {**head, "columns": [r.asDict() for r in df.collect()]}
            )
        )
        return

    if args.mode == "mask":
        from etl_pipeline_spark.lake import masking

        if not args.column or args.mask_kind is None:
            ap.error("--mode mask requires --column and --mask-kind")
        if args.mask_kind == "none":
            v = masking.drop_masking_policy(table, args.column)
        else:
            v = masking.set_masking_policy(
                table, args.column, args.mask_kind
            )
        print(
            json.dumps(
                {"version": v, "policies": masking.masking_policies(table)}
            )
        )
        return

    if args.mode == "row-filter":
        from etl_pipeline_spark.lake import masking

        if args.where:
            v = masking.set_row_filter(table, args.where)
        else:
            v = masking.drop_row_filter(table)
        print(
            json.dumps(
                {"version": v, "row_filter": masking.row_filter(table)}
            )
        )
        return

    if args.mode == "analyze":
        cols = (
            [c.strip() for c in args.analyze_columns.split(",")]
            if args.analyze_columns
            else None
        )
        v = table.analyze(columns=cols)
        print(json.dumps({"version": v, "stats": table.table_stats()}))
        return

    cfg = ApplyConfig(lineage_level=args.lineage_level)
    n_lineage_before = len(LineageLog(table.root).records())
    if args.mode == "requeue":
        from etl_pipeline_spark.pipeline import requeue_dead_letters

        res = requeue_dead_letters(
            spark, table, batch_id=args.batch_index, cfg=cfg
        )
        print(
            json.dumps(
                {
                    "requeue_skipped": res.skipped,
                    "reason": res.reason,
                    "rows_upserted": res.rows_upserted,
                    "rows_deleted": res.rows_deleted,
                    "final_version": table.current_version(),
                }
            )
        )
        return
    if args.changelog is None:
        ap.error(f"--mode {args.mode} requires --changelog")
    if args.mode == "stream":
        ckpt = args.checkpoint or os.path.join(args.table, "_checkpoint")
        run_ingest_stream(
            spark, args.changelog, table, ckpt,
            cfg=cfg, max_files_per_trigger=args.files_per_trigger,
        )
    elif args.mode == "evolving-stream":
        ckpt = args.checkpoint or os.path.join(args.table, "_checkpoint")
        restarts = run_ingest_stream_evolving(
            spark, args.changelog, table, ckpt,
            cfg=cfg, max_files_per_trigger=args.files_per_trigger,
        )
        if restarts:
            print(f"schema widened {restarts}x during ingest", file=sys.stderr)
    else:
        if args.to_branch and args.to_branch not in table.branches():
            table.create_branch(args.to_branch)
        replay_files(
            spark, args.changelog, table, cfg=cfg,
            files_per_batch=args.files_per_trigger,
            pipeline_depth=args.pipeline_depth,
            to_branch=args.to_branch,
        )

    # summarize only THIS invocation's lineage records (the log persists
    # across runs; a fenced re-run must report 0 applied, not history)
    recs = [
        r for r in LineageLog(table.root).records()[n_lineage_before:]
        if not r.get("skipped_fenced")
    ]
    total = sum(r.get("events_in", 0) for r in recs)
    print(
        json.dumps(
            {
                "batches_applied": len(recs),
                "events_applied": total,
                "final_version": table.current_version(),
                "live_rows": table.read().count(),
            }
        )
    )


if __name__ == "__main__":
    main()
