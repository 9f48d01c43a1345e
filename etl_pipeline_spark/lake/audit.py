"""Table integrity audit — the lake's fsck.

``audit_table(table, level=...)`` sweeps a MiniLake table for invariant
violations and returns a structured report. Three escalating levels,
each priced for what a 10^10-row deployment can afford to run:

- ``"metadata"`` — manifest-chain + reference consistency from
  driver-side JSON alone (milliseconds; safe on every commit): CURRENT
  resolves, parent snapshot ids chain, every referenced data dir
  exists, file_stats entries cover exactly the live dir set, bucket
  ids parse and fit the modulus, fences/max-lsn are sane, tag and
  branch refs resolve.
- ``"files"`` — adds a driver-side Parquet FOOTER walk of every live
  file (O(files) metadata reads, no Spark job): footers readable, the
  manifest's per-dir row counts and key/lsn bounds match the footers
  exactly (a drifted count means a file was tampered with or a stats
  bug — either way pruning could silently lie).
- ``"data"`` — adds Spark jobs over the data itself (O(table) — a
  maintenance-window audit): every row hash-routes to the bucket dir
  it lives in (a mis-bucketed row is invisible to point lookups and
  merges forever), and on resolved snapshots keys are unique per
  bucket (a duplicate would double-serve under the fold-skip read).

The reference has no durable state to audit at all — each scrape run
rebuilds from scratch (/root/reference/main.py:228-264); this is the
operational surface that a table format which CAN carry state forward
owes its operators. Returns ``{"ok": bool, "level": str, "findings":
[{"level", "code", "detail"}, ...], "checked": {...counts}}`` — empty
findings means every invariant held.
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import functions as F

from ..schema import BUCKET_COL, DELETED_COL, LSN_COL, physical_name
from .minilake import DEAD_BUCKET, MiniLakeTable, snapshot_is_resolved

LEVELS = ("metadata", "files", "data")


def _find(findings: list, level: str, code: str, detail: str) -> None:
    findings.append({"level": level, "code": code, "detail": detail})


def _audit_metadata(t: MiniLakeTable, findings: list, checked: dict) -> dict:
    m = None
    try:
        m = t.manifest()
    except Exception as e:  # CURRENT missing/unreadable
        _find(findings, "metadata", "current-unresolvable", str(e))
        return {}
    versions = sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(t.meta_dir, "v*.json"))
    )
    checked["manifests"] = len(versions)
    if m["version"] != max(versions, default=-1):
        # a committed v-file beyond CURRENT is a torn commit the CAS
        # recovery path adopts; CURRENT pointing past the max is worse
        if m["version"] > max(versions, default=-1):
            _find(
                findings, "metadata", "current-beyond-manifests",
                f"CURRENT=v{m['version']} but max manifest is "
                f"v{max(versions, default=-1)}",
            )
    by_version = {}
    for v in versions:
        try:
            by_version[v] = t.manifest(v)
        except Exception as e:
            _find(findings, "metadata", "manifest-unreadable",
                  f"v{v}: {e}")
    for v, mv in by_version.items():
        parent = mv.get("parent_snapshot_id")
        prev = by_version.get(v - 1)
        if prev is not None and parent != prev["snapshot_id"]:
            _find(
                findings, "metadata", "snapshot-chain-broken",
                f"v{v}.parent_snapshot_id != v{v - 1}.snapshot_id",
            )
    n_buckets = m.get("n_buckets", 0)
    live_dirs = []
    for b, ds in m.get("buckets", {}).items():
        try:
            bi = int(b)
        except ValueError:
            _find(findings, "metadata", "bucket-id-unparseable", repr(b))
            continue
        if not (0 <= bi < n_buckets or bi == DEAD_BUCKET):
            _find(
                findings, "metadata", "bucket-id-out-of-range",
                f"bucket {bi} with n_buckets={n_buckets}",
            )
        for d in ds:
            live_dirs.append(d)
            if not os.path.isdir(d):
                _find(findings, "metadata", "dir-missing", d)
    checked["dirs"] = len(live_dirs)
    stats = m.get("file_stats", {})
    live_set = set(live_dirs)
    for d in stats:
        if d not in live_set:
            _find(
                findings, "metadata", "stats-for-dead-dir",
                f"file_stats references unregistered dir {d}",
            )
    props = m.get("properties", {})
    from .minilake import FENCES_PROP, MAX_LSN_PROP

    fences = props.get(FENCES_PROP, {})
    if not isinstance(fences, dict) or any(
        not isinstance(v, int) for v in fences.values()
    ):
        _find(findings, "metadata", "fences-malformed", repr(fences))
    if not isinstance(props.get(MAX_LSN_PROP, -1), int):
        _find(findings, "metadata", "max-lsn-malformed",
              repr(props.get(MAX_LSN_PROP)))
    for name, v in t.tags().items():
        if v not in by_version:
            _find(findings, "metadata", "tag-dangling",
                  f"tag {name!r} -> v{v} (manifest gone)")
    for b in t.branches():
        try:
            bd = t._load_branch(b)
            if bd["base_version"] not in by_version:
                _find(findings, "metadata", "branch-base-dangling",
                      f"branch {b!r} base v{bd['base_version']}")
        except Exception as e:
            _find(findings, "metadata", "branch-unreadable", f"{b}: {e}")
    return m


def _audit_files(t: MiniLakeTable, m: dict, findings: list,
                 checked: dict) -> None:
    import pyarrow.parquet as pq

    from ..schema import schema_from_manifest

    stats = m.get("file_stats", {})
    schema = schema_from_manifest(m["schema"])
    key0 = m["key_cols"][0]
    pkey0 = {f.name: physical_name(f) for f in schema.fields}[key0]
    n_files = 0
    for b, ds in m.get("buckets", {}).items():
        for d in ds:
            if not os.path.isdir(d):
                continue  # already a metadata finding
            rows = 0
            kmin = kmax = lmin = lmax = None
            usable = True
            rows_complete = True  # False once any footer is unreadable
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                n_files += 1
                path = os.path.join(d, name)
                try:
                    md = pq.read_metadata(path)
                except Exception as e:
                    _find(findings, "files", "footer-unreadable",
                          f"{path}: {e}")
                    usable = False
                    # the dir's footer row total is now incomplete —
                    # a drift comparison against it would report a
                    # phantom second finding for the same fault
                    rows_complete = False
                    continue
                rows += md.num_rows
                names = [
                    md.schema.column(i).name
                    for i in range(md.num_columns)
                ]
                if LSN_COL not in names:
                    _find(findings, "files", "lsn-column-missing", path)
                    usable = False
                    continue
                ki = names.index(pkey0) if pkey0 in names else None
                li = names.index(LSN_COL)
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    ls = g.column(li).statistics
                    if ls is None or not ls.has_min_max:
                        usable = False
                        continue
                    lmin = ls.min if lmin is None else min(lmin, ls.min)
                    lmax = ls.max if lmax is None else max(lmax, ls.max)
                    if ki is None:
                        usable = False
                        continue
                    ks = g.column(ki).statistics
                    if (
                        ks is None or not ks.has_min_max
                        or not isinstance(ks.min, (str, int, float))
                        or (isinstance(ks.min, float)
                            and (math.isnan(ks.min) or math.isnan(ks.max)))
                    ):
                        usable = False
                        continue
                    kmin = ks.min if kmin is None else min(kmin, ks.min)
                    kmax = ks.max if kmax is None else max(kmax, ks.max)
            s = stats.get(d)
            if s is None or not rows_complete:
                continue  # absent stats are legal (never prune);
                # incomplete footer sums already have their own finding
            if s.get("rows") != rows:
                _find(
                    findings, "files", "row-count-drift",
                    f"{d}: manifest says {s.get('rows')} rows, footers "
                    f"say {rows}",
                )
            if usable and kmin is not None:
                if s.get("key_min") != kmin or s.get("key_max") != kmax:
                    _find(
                        findings, "files", "key-bounds-drift",
                        f"{d}: manifest [{s.get('key_min')}, "
                        f"{s.get('key_max')}] vs footer [{kmin}, {kmax}]",
                    )
                if s.get("lsn_min") != int(lmin) or (
                    s.get("lsn_max") != int(lmax)
                ):
                    _find(
                        findings, "files", "lsn-bounds-drift",
                        f"{d}: manifest [{s.get('lsn_min')}, "
                        f"{s.get('lsn_max')}] vs footer "
                        f"[{int(lmin)}, {int(lmax)}]",
                    )
    checked["files"] = n_files


def _audit_data(t: MiniLakeTable, m: dict, findings: list,
                checked: dict) -> None:
    key0 = m["key_cols"][0]
    n_buckets = m["n_buckets"]
    # one job: read each bucket's dirs tagged with their DIR bucket and
    # compare against the recomputed hash route
    bad_total = 0
    for b, ds in sorted(m["buckets"].items(), key=lambda kv: int(kv[0])):
        bi = int(b)
        if bi == DEAD_BUCKET:
            continue
        live = [d for d in ds if os.path.isdir(d)]
        if not live:
            continue
        phys = t._read_files(live, version=m["version"])
        bad = (
            phys.select(t._bucket_expr(key0, n_buckets).alias("_b"))
            .filter(F.col("_b") != bi)
            .count()
        )
        if bad:
            bad_total += bad
            _find(
                findings, "data", "mis-bucketed-rows",
                f"bucket {bi}: {bad} rows hash-route elsewhere",
            )
    checked["buckets_scanned"] = len(m["buckets"])
    resolved = snapshot_is_resolved(m)
    if resolved and m.get("merge_engine", "lww") == "lww":
        # one pass for both resolved-snapshot invariants: the fold-skip
        # read SERVES resolved snapshots verbatim, so a duplicate key is
        # user-visible; and no live row may sit below a higher tombstone
        # (the LWW fold materialized that at rewrite time)
        dirs = [d for ds in m["buckets"].values() for d in ds
                if os.path.isdir(d)]
        if dirs:
            phys = t._read_files(dirs, version=m["version"])
            row = (
                phys.groupBy(*m["key_cols"])
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.max(F.when(F.col(DELETED_COL), F.col(LSN_COL)))
                    .alias("_t"),
                    F.max(F.when(~F.col(DELETED_COL), F.col(LSN_COL)))
                    .alias("_l"),
                )
                .agg(
                    F.count(F.when(F.col("_n") > 1, 1)).alias("dups"),
                    F.count(
                        F.when(
                            F.col("_t").isNotNull()
                            & F.col("_l").isNotNull()
                            & (F.col("_t") > F.col("_l")),
                            1,
                        )
                    ).alias("shadowed"),
                )
                .first()
            )
            if row["dups"]:
                _find(
                    findings, "data", "duplicate-keys-in-resolved",
                    f"{row['dups']} keys appear more than once in a "
                    "resolved snapshot (fold-skip reads serve both "
                    "copies)",
                )
            if row["shadowed"]:
                _find(
                    findings, "data", "live-row-under-tombstone",
                    f"{row['shadowed']} keys hold a live row below a "
                    "higher tombstone in a resolved snapshot",
                )


def audit_table(table: MiniLakeTable, level: str = "files") -> dict:
    """Run the integrity audit at ``level`` (each level includes the
    cheaper ones). See the module docstring for what each level checks
    and costs."""
    if level not in LEVELS:
        raise ValueError(f"level must be one of {LEVELS}, got {level!r}")
    findings: list[dict] = []
    checked: dict[str, int] = {}
    m = _audit_metadata(table, findings, checked)
    if m and level in ("files", "data"):
        _audit_files(table, m, findings, checked)
    if m and level == "data":
        _audit_data(table, m, findings, checked)
    return {
        "ok": not findings,
        "level": level,
        "findings": findings,
        "checked": checked,
    }
