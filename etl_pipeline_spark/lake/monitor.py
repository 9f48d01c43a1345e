"""Snapshot-to-snapshot profile drift — table monitoring over history.

``profile_drift`` compares per-column profiles (row count, distinct
count, null count) between two committed snapshots of the same table
and reports the deltas — the data-quality monitor a CDC lake needs to
answer "what did last night's ingest do to this table?" without
replaying it. Generalizes the reference's per-run count logging
(`/root/reference/utils/transform.py:124-128` logs row counts per
cleaning step, then throws them away) into a queryable, versioned
profile diff.

Two modes, chosen by what you can afford:

- ``mode="stats"`` — METADATA ONLY: diff the ANALYZE results stored in
  the two manifests (:meth:`MiniLakeTable.table_stats`, the Puffin
  analog — HLL++ NDV, exact null counts, live row count). Zero scans,
  O(columns) driver work; the 100 TB path, provided ANALYZE (or its
  O(changes) incremental fold) ran near both snapshots. The result
  carries ``computed_at_version`` per side so the caller can judge
  staleness instead of being silently served old numbers.
- ``mode="exact"`` — the audit path: one aggregation pass over each
  snapshot's resolved live state (two pruned scans, exact
  ``count(DISTINCT)``). Right for acceptance tests and small-SF
  grading; exact distinct at 10^10 rows is the thing that stops
  scaling, which is why stats mode exists.

Both return one DataFrame row per column with from/to/delta triples —
tiny, driver-built, schema-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schema import physical_name, schema_from_manifest
from .minilake import MiniLakeTable

DRIFT_SCHEMA = (
    "col_name string, rows_from long, rows_to long, rows_delta long, "
    "ndv_from long, ndv_to long, ndv_delta long, "
    "nulls_from long, nulls_to long, nulls_delta long"
)


def _exact_profile(
    table: MiniLakeTable, version: int, columns: list[str]
) -> tuple[int, dict[str, tuple[int, int]]]:
    # projected read: the LWW fold runs over only the profiled columns,
    # so column pruning reaches the scan — a 3-column profile of a
    # 40-column table reads 3 columns, not 40
    df = table.read(version=version, columns=columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(columns):
        aggs.append(F.countDistinct(c).alias(f"__ndv{i}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nul{i}"))
    row = df.agg(*aggs).first()
    return int(row["__rows"]), {
        c: (int(row[f"__ndv{i}"]), int(row[f"__nul{i}"]))
        for i, c in enumerate(columns)
    }


def _stats_profile(
    table: MiniLakeTable, version: int, columns: list[str]
) -> tuple[int, dict[str, tuple[int, int]], int]:
    s = table.table_stats(version=version)
    if s is None:
        raise ValueError(
            f"no ANALYZE stats stored at version {version}; run "
            "analyze()/analyze_incremental() or use mode='exact'"
        )
    missing = [c for c in columns if c not in s["columns"]]
    if missing:
        raise ValueError(
            f"columns {missing} not covered by the stats at version "
            f"{version}; re-run analyze() over them or use mode='exact'"
        )
    return (
        int(s["live_rows"]),
        {
            c: (int(s["columns"][c]["ndv"]), int(s["columns"][c]["nulls"]))
            for c in columns
        },
        int(s["computed_at_version"]),
    )


def schema_drift(
    table: MiniLakeTable, v_from: int, v_to: int | None = None
) -> list[dict]:
    """Schema changes between two snapshots, resolved through PHYSICAL
    column identity (the field-id analog), so a metadata-only rename is
    reported as a rename — not as a drop + add. Pure driver-side
    manifest work, zero scans. One dict per change:
    ``{"change": added|dropped|renamed|widened|narrowed|retyped,
    "column", "from_type", "to_type", "from_name"}`` (fields absent
    where meaningless). Type changes are classified by the numeric
    widening ladder: a genuine widening (int → bigint) reports
    ``widened``, the reverse ``narrowed``, anything else ``retyped`` —
    a drift gate must never mislabel a risky change as a widening."""
    if v_to is None:
        v_to = table.current_version()
    a = {
        physical_name(f): f
        for f in schema_from_manifest(table.manifest(v_from)["schema"]).fields
    }
    b = {
        physical_name(f): f
        for f in schema_from_manifest(table.manifest(v_to)["schema"]).fields
    }
    out: list[dict] = []
    for p, f in b.items():
        if p not in a:
            out.append(
                {"change": "added", "column": f.name,
                 "to_type": f.dataType.simpleString()}
            )
            continue
        g = a[p]
        if g.name != f.name:
            out.append(
                {"change": "renamed", "column": f.name,
                 "from_name": g.name}
            )
        if g.dataType != f.dataType:
            # widening precedence ladder (the engine's own widen_column
            # surface): within it, rank decides widened vs narrowed;
            # any change leaving the ladder is a retype
            rank = {
                "tinyint": 0, "smallint": 1, "int": 2, "bigint": 3,
                "float": 4, "double": 5,
            }
            ft = g.dataType.simpleString()
            tt = f.dataType.simpleString()
            if ft in rank and tt in rank:
                kind = "widened" if rank[tt] > rank[ft] else "narrowed"
            else:
                kind = "retyped"
            out.append(
                {"change": kind, "column": f.name,
                 "from_type": ft, "to_type": tt}
            )
    for p, g in a.items():
        if p not in b:
            out.append(
                {"change": "dropped", "column": g.name,
                 "from_type": g.dataType.simpleString()}
            )
    return out


def check_drift(
    table: MiniLakeTable,
    v_from: int,
    v_to: int | None = None,
    columns: list[str] | None = None,
    mode: str = "exact",
    max_rows_delta_pct: float | None = None,
    max_ndv_delta_pct: float | None = None,
    max_nulls_delta_pct: float | None = None,
    forbid_schema_changes: bool = False,
    max_stats_lag: int = 1,
) -> dict:
    """The enforceable form of :func:`profile_drift` — the audit-style
    gate a scheduled monitoring job runs after each ingest window:
    compute the drift, judge it against the given thresholds, and
    return ``{"ok": bool, "findings": [...], "profile": [...],
    "schema_changes": [...]}``. Percentage deltas are relative to the
    ``from`` side; a from-value of 0 with any growth is reported as
    the string ``"inf"`` (kept JSON-clean — ``float('inf')`` is not
    valid JSON) and violates every finite threshold (a column
    springing into existence IS drift). ``None`` thresholds are not
    judged — callers opt into exactly the invariants their table has.

    In stats mode a STALE profile is itself a finding: each side's
    numbers were computed at ``stats_at_*``; a lag beyond
    ``max_stats_lag`` versions behind its endpoint (default 1 — the
    ANALYZE commit's own version bump) means the gate would be judging
    data older than the drift it exists to catch."""

    def _pct(frm: int, delta: int):
        if frm == 0:
            return "inf" if delta else 0.0
        return abs(delta) / frm

    def _violates(pct, tol: float) -> bool:
        return pct == "inf" or pct > tol

    findings: list[dict] = []
    prof = profile_drift(
        table, v_from=v_from, v_to=v_to, columns=columns, mode=mode
    ).collect()
    gates_requested = any(
        t is not None
        for t in (max_rows_delta_pct, max_ndv_delta_pct,
                  max_nulls_delta_pct)
    )
    if gates_requested and not prof:
        raise ValueError(
            "profile gates were requested but no columns were "
            "profiled (no common columns between the two snapshots?); "
            "pass columns= explicitly"
        )
    if mode == "stats" and prof:
        resolved_to = (
            v_to if v_to is not None else table.current_version()
        )
        for side, endpoint, at in (
            ("from", v_from, prof[0]["stats_at_from"]),
            ("to", resolved_to, prof[0]["stats_at_to"]),
        ):
            if endpoint - at > max_stats_lag:
                findings.append(
                    {
                        "kind": "stale-stats",
                        "side": side,
                        "endpoint_version": endpoint,
                        "computed_at_version": at,
                        "max_stats_lag": max_stats_lag,
                    }
                )
    if prof and max_rows_delta_pct is not None:
        # table-level, judged once (identical across the per-column rows)
        r0 = prof[0]
        pct = _pct(r0["rows_from"], r0["rows_delta"])
        if _violates(pct, max_rows_delta_pct):
            findings.append(
                {
                    "kind": "rows-drift",
                    "delta_pct": pct,
                    "tolerance": max_rows_delta_pct,
                    "from": r0["rows_from"],
                    "delta": r0["rows_delta"],
                }
            )
    for r in prof:
        checks = (
            ("ndv", max_ndv_delta_pct, r["ndv_from"], r["ndv_delta"]),
            ("nulls", max_nulls_delta_pct, r["nulls_from"],
             r["nulls_delta"]),
        )
        for metric, tol, frm, delta in checks:
            if tol is None:
                continue
            pct = _pct(frm, delta)
            if _violates(pct, tol):
                findings.append(
                    {
                        "kind": f"{metric}-drift",
                        "column": r["col_name"],
                        "delta_pct": pct,
                        "tolerance": tol,
                        "from": frm,
                        "delta": delta,
                    }
                )
    changes = schema_drift(table, v_from=v_from, v_to=v_to)
    if forbid_schema_changes:
        findings.extend(
            {"kind": "schema-change", **c} for c in changes
        )
    return {
        "ok": not findings,
        "findings": findings,
        "profile": [r.asDict() for r in prof],
        "schema_changes": changes,
    }


def profile_drift(
    table: MiniLakeTable,
    v_from: int,
    v_to: int | None = None,
    columns: list[str] | None = None,
    mode: str = "exact",
) -> DataFrame:
    """Per-column profile delta between snapshots ``v_from`` → ``v_to``
    (default: current). See module docstring for the two modes. In
    stats mode the frame gains ``stats_at_from`` / ``stats_at_to``
    columns (the version each side's numbers were computed AT)."""
    if mode not in ("exact", "stats"):
        raise ValueError(f"mode must be 'exact' or 'stats', got {mode!r}")
    if columns is not None and not columns:
        raise ValueError("columns must be non-empty or None")
    if v_to is None:
        v_to = table.current_version()
    schema = table.schema(v_to)
    if columns is None:
        from_names = {f.name for f in table.schema(v_from).fields}
        columns = [f.name for f in schema.fields if f.name in from_names]
        if not columns:
            raise ValueError(
                "no columns were profiled: the two snapshots share no "
                "column names (renames between them?); pass columns= "
                "explicitly"
            )
    else:
        for side, v in (("from", v_from), ("to", v_to)):
            have = {f.name for f in table.schema(v).fields}
            bad = [c for c in columns if c not in have]
            if bad:
                raise ValueError(
                    f"columns {bad} absent from the v_{side}={v} schema"
                )
    if mode == "exact":
        rows_a, prof_a = _exact_profile(table, v_from, columns)
        rows_b, prof_b = _exact_profile(table, v_to, columns)
        out_schema, extra = DRIFT_SCHEMA, ()
    else:
        rows_a, prof_a, at_a = _stats_profile(table, v_from, columns)
        rows_b, prof_b, at_b = _stats_profile(table, v_to, columns)
        out_schema = DRIFT_SCHEMA + ", stats_at_from long, stats_at_to long"
        extra = (at_a, at_b)
    rows = []
    for c in columns:
        ndv_a, nul_a = prof_a[c]
        ndv_b, nul_b = prof_b[c]
        rows.append(
            (
                c,
                rows_a,
                rows_b,
                rows_b - rows_a,
                ndv_a,
                ndv_b,
                ndv_b - ndv_a,
                nul_a,
                nul_b,
                nul_b - nul_a,
            )
            + extra
        )
    return table.spark.createDataFrame(rows, out_schema)
