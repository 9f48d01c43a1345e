"""Generic conditional MERGE INTO and replaceWhere-style overwrite.

The CDC merge engines (:meth:`MiniLakeTable.merge` and the
partial/aggregate folds) apply *changelogs* — streams that already say
what to do per row. This module adds the command-style counterpart: the
Delta Lake ``MERGE INTO`` builder (``whenMatchedUpdate`` /
``whenMatchedDelete`` / ``whenNotMatchedInsert`` /
``whenNotMatchedBySource*``) and ``replaceWhere`` overwrite, compiled
down to ONE fenced LWW merge batch — so every lake guarantee (atomic
snapshot commit, CAS conflict retry, CHECK constraints, CDC-out
visibility, replication, incremental-MV feeds, row lineage) applies to
command-style writes for free.

Reference analog: none — §2.8 gap-fill on the K3 sink family (the
reference's only write path is truncate+insert, ``load.py:190-290``);
the public API surface mirrors Delta's ``DeltaTable.merge`` builder and
``replaceWhere`` semantics.

Scale shape
-----------
* Matched-row detection needs target rows only for the SOURCE's keys.
  Two strategies, picked per call (``strategy="auto"``):

  - **point** — when the source touches few distinct primary keys
    (≤ ``point_lookup_threshold``), probe them via
    :meth:`MiniLakeTable.read_for_keys`: bucket-pruned +
    manifest-bounds-pruned, O(touched buckets), never O(table). The key
    probe is a bounded driver-side list (same accepted cost class as
    the point-lookup read path itself).
  - **scan** — otherwise one distributed hash join of the resolved
    table against the source, shuffled on the key columns: O(table)
    scan but fully parallel, no driver data path.

* ``WHEN NOT MATCHED BY SOURCE`` clauses force the scan strategy — they
  are anti-joins against the whole live state by definition (Delta
  documents the same cost cliff).
* The compiled change batch is O(touched rows); the commit is the
  normal bucket-pruned MOR append — files holding untouched keys are
  never rewritten.

Semantics
---------
Clause precedence follows SQL MERGE: for a matched row, the DELETE
condition is evaluated first, then UPDATE; a row matching neither
condition is left untouched. Condition and assignment expressions are
Spark SQL strings over two row scopes: ``s.<col>`` (source) and
``t.<col>`` (current target row); not-matched-insert expressions may
only reference ``s.*`` (``t.*`` is null there), by-source expressions
only ``t.*``.

All emitted events share one LSN above the table's high-water — they
beat every event already applied, and an event a concurrent CDC tail
delivers later with a higher LSN wins over the command, exactly the
:meth:`delete_where` / :meth:`update_where` convention (the stream
stays the source of truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schema import write_default
from .minilake import MAX_LSN_PROP, MergeResult, MiniLakeTable

STAR = "*"


def _check_assignments(
    table: MiniLakeTable, assignments, key_cols, payload, what: str
):
    if assignments is None or assignments == STAR:
        return
    for c in assignments:
        if c in key_cols:
            raise ValueError(
                f"{what}: cannot assign key column {c!r} — key changes "
                "are a delete + insert, not an update"
            )
        if c not in payload:
            raise ValueError(f"{what}: no column {c!r} in the table schema")


def merge_into(
    table: MiniLakeTable,
    source: DataFrame,
    *,
    update_set: "dict[str, str] | str | None" = None,
    update_condition: str | None = None,
    delete_condition: str | None = None,
    insert_values: "dict[str, str] | str | None" = None,
    insert_condition: str | None = None,
    by_source_delete_condition: str | None = None,
    by_source_update_set: "dict[str, str] | None" = None,
    by_source_update_condition: str | None = None,
    strategy: str = "auto",
    point_lookup_threshold: int = 1000,
    assert_unique_source: bool = True,
    stream_id: str = "merge_into",
) -> MergeResult:
    """``MERGE INTO table USING source ON <key equality>`` with Delta's
    clause set, compiled to one fenced LWW merge batch.

    ``source`` must carry the table's key columns (non-null) and at
    most one row per key (asserted unless ``assert_unique_source=False``
    — SQL MERGE's multiple-matches error). ``update_set`` /
    ``insert_values`` accept ``"*"`` (every source payload column) or a
    ``{col: sql_expr}`` dict; for an UPDATE, unassigned payload columns
    keep the target row's value (the emitted event is full-row — LWW
    replaces whole rows); for an INSERT, unassigned columns get the
    column's declared write-default, else null.
    """
    m = table.manifest()
    if m.get("merge_engine", "lww") != "lww":
        raise ValueError(
            "merge_into requires the lww merge engine — partial/agg "
            "tables fold events column-wise, which contradicts MERGE's "
            "full-row clause semantics"
        )
    key_cols = m["key_cols"]
    schema = table.schema()
    payload = [f.name for f in schema.fields if f.name not in key_cols]
    fields = {f.name: f for f in schema.fields}

    has_by_source = (
        by_source_delete_condition is not None
        or by_source_update_set is not None
    )
    if by_source_update_set is not None and by_source_update_condition is None:
        raise ValueError(
            "by_source_update_set requires by_source_update_condition "
            "(an unconditional one would rewrite the whole table; pass "
            "'true' explicitly if that is really intended)"
        )
    if not any(
        x is not None
        for x in (update_set, delete_condition, insert_values)
    ) and not has_by_source:
        raise ValueError("merge_into: no clauses given")
    missing = [k for k in key_cols if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks key column(s) {missing}")
    _check_assignments(table, update_set, key_cols, payload, "update_set")
    _check_assignments(
        table, insert_values, key_cols, payload, "insert_values"
    )
    _check_assignments(
        table, by_source_update_set, key_cols, payload,
        "by_source_update_set",
    )
    if strategy not in ("auto", "point", "scan"):
        raise ValueError(f"unknown strategy {strategy!r}")

    # -- source hygiene: non-null keys, unique per key (bounded probes
    # on what is typically a small command input; opt out for huge
    # pre-validated sources)
    null_key = F.lit(False)
    for k in key_cols:
        null_key = null_key | F.col(k).isNull()
    if source.filter(null_key).limit(1).count():
        raise ValueError("merge_into source has null key values")
    if assert_unique_source:
        dup = (
            source.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "merge_into source has multiple rows per key (SQL MERGE "
                "multiple-matches error) — pre-reduce it (e.g. "
                "operators.lww.lww_reduce) or pass "
                "assert_unique_source=False if already guaranteed"
            )

    # -- target rows for clause evaluation
    key0 = key_cols[0]
    if has_by_source:
        strategy = "scan"  # anti-join against the whole live state
    if strategy == "auto":
        probe = [
            r[0]
            for r in source.select(key0)
            .distinct()
            .limit(point_lookup_threshold + 1)
            .collect()
        ]
        strategy = "point" if len(probe) <= point_lookup_threshold else "scan"
    else:
        probe = None
    if strategy == "point":
        if probe is None:
            probe = [r[0] for r in source.select(key0).distinct().collect()]
        target = table.read_for_keys(probe)
    else:
        target = table.read()

    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in key_cols:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    how = "full_outer" if has_by_source else "right_outer"
    j = t.join(s, cond, how)

    s_present = F.col(f"s.{key0}").isNotNull()
    t_present = F.col(f"t.{key0}").isNotNull()
    matched = s_present & t_present

    def _c(expr: str | None, default: bool):
        return F.expr(expr) if expr is not None else F.lit(default)

    # op per row, SQL MERGE clause precedence (delete before update
    # within the matched branch; untouched rows drop out)
    op = F.lit(None).cast("string")
    if insert_values is not None:
        op = F.when(
            s_present & ~t_present & _c(insert_condition, True), "I"
        ).otherwise(op)
    if has_by_source:
        if by_source_update_set is not None:
            op = F.when(
                t_present
                & ~s_present
                & _c(by_source_update_condition, False),
                "U",
            ).otherwise(op)
        if by_source_delete_condition is not None:
            op = F.when(
                t_present & ~s_present & F.expr(by_source_delete_condition),
                "D",
            ).otherwise(op)
    if update_set is not None:
        op = F.when(matched & _c(update_condition, True), "U").otherwise(op)
    if delete_condition is not None:
        op = F.when(matched & F.expr(delete_condition), "D").otherwise(op)

    def _assigned(spec, c: str):
        if spec == STAR:
            return F.expr(f"s.{c}") if c in source.columns else None
        if spec is not None and c in spec:
            return F.expr(spec[c])
        return None

    cols = [F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in key_cols]
    for c in payload:
        upd = _assigned(update_set, c)
        ins = _assigned(insert_values, c)
        bsu = (
            F.expr(by_source_update_set[c])
            if by_source_update_set is not None and c in by_source_update_set
            else None
        )
        t_val = F.col(f"t.{c}") if c in target.columns else F.lit(None)
        ins_default = F.lit(write_default(fields[c]))
        v = (
            F.when(op == "D", F.lit(None))
            .when(matched, (upd if upd is not None else t_val))
            .when(~t_present, (ins if ins is not None else ins_default))
            .otherwise(bsu if bsu is not None else t_val)
        ).cast(fields[c].dataType)
        cols.append(v.alias(c))

    next_lsn = int(m["properties"].get(MAX_LSN_PROP, -1)) + 1
    events = (
        j.select(*cols, op.alias("op"))
        .filter(F.col("op").isNotNull())
        .withColumn("lsn", F.lit(next_lsn).cast("long"))
    )
    return table.merge(events, batch_id=m["version"], stream_id=stream_id)


def overwrite_where(
    table: MiniLakeTable,
    predicate: str,
    replacement: DataFrame,
    *,
    validate: bool = True,
    stream_id: str = "overwrite_where",
) -> MergeResult:
    """Delta ``replaceWhere`` as one atomic commit: every live row
    matching ``predicate`` is replaced by ``replacement`` (full-row
    frames keyed on the table's key columns) in a SINGLE fenced merge —
    deletes for vacated keys plus upserts for the new rows land in one
    snapshot, so readers never observe the half-replaced state.

    ``validate=True`` (default, Delta's constraint) rejects replacement
    rows that do NOT satisfy ``predicate`` — otherwise the command
    would silently write outside the region it claims to replace.
    O(scan of the predicate region) + O(replacement); MOR appends, no
    file rewrite.
    """
    m = table.manifest()
    if m.get("merge_engine", "lww") != "lww":
        raise ValueError("overwrite_where requires the lww merge engine")
    key_cols = m["key_cols"]
    missing = [k for k in key_cols if k not in replacement.columns]
    if missing:
        raise ValueError(f"replacement lacks key column(s) {missing}")
    if validate and replacement.filter(~F.expr(predicate)).limit(1).count():
        raise ValueError(
            "replacement rows violate the replaceWhere predicate "
            f"{predicate!r} (pass validate=False to override)"
        )
    dup = (
        replacement.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError("replacement has multiple rows per key")

    next_lsn = int(m["properties"].get(MAX_LSN_PROP, -1)) + 1
    schema = table.schema()
    payload = [f.name for f in schema.fields if f.name not in key_cols]
    vacated = (
        table.read()
        .filter(F.expr(predicate))
        .select(*key_cols)
        .join(replacement.select(*key_cols), key_cols, "left_anti")
        .select(
            *key_cols,
            *[F.lit(None).cast(f.dataType).alias(f.name)
              for f in schema.fields if f.name in payload],
            F.lit("D").alias("op"),
        )
    )
    upserts = replacement.select(
        *key_cols,
        *[
            (F.col(c) if c in replacement.columns else F.lit(write_default(f)))
            .cast(f.dataType)
            .alias(c)
            for c, f in ((f.name, f) for f in schema.fields)
            if c in payload
        ],
        F.lit("U").alias("op"),
    )
    events = vacated.unionByName(upserts).withColumn(
        "lsn", F.lit(next_lsn).cast("long")
    )
    return table.merge(events, batch_id=m["version"], stream_id=stream_id)
