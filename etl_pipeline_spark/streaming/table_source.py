"""Streaming table read: the MiniLake change feed as a native Spark
Structured Streaming SOURCE (the Delta/Iceberg ``readStream`` on a
table analog), built on Spark 4's Python Data Source API.

    from etl_pipeline_spark.streaming.table_source import register
    register(spark)
    feed = (spark.readStream.format("minilake_changes")
                 .option("path", table.root)
                 .load())

Offsets are TABLE VERSIONS: each micro-batch serves exactly the delta
rows that :meth:`MiniLakeTable.read_changes_since(start, end)` would —
the per-batch LWW winners every MERGE appended, tombstones included,
bookkeeping columns visible, plus a ``_commit_version`` provenance
column. Spark checkpoints the version offsets, so a restarted query
resumes exactly where it stopped (exactly-once: manifests and delta
files are immutable, the same version span always replays the same
rows). Compaction/rescale rewrites are maintenance, not changes, and
never appear in the feed; fence-only and DDL commits yield empty
micro-batches.

Scale shape: ``partitions()`` is a driver-side manifest walk
(O(versions in the span) JSON reads, no Spark job); each new delta dir
becomes one input partition whose executor-side read is a pyarrow scan
yielding ARROW RECORD BATCHES — no per-row Python anywhere. A feed
micro-batch is O(changes in the span), never O(table).

Contracts and limits (each enforced with a clear error):

- LWW tables only — the partial/agg engines store fold state
  (write-LSN siblings) whose change semantics are engine-specific;
  their consumers use :meth:`read_changes_since` batch exports.
- The schema is pinned at query start (manifest at that moment).
  In-flight ADDITIVE evolution is safe — pre-add files surface the
  column as its initial-default/null, post-add files surface stored
  values — but a column added AFTER the query started only appears on
  restart (same restart-on-widen contract as the evolving-stream
  ingest driver).
- A consumer that falls behind the retention-GC horizon fails with the
  same remedy as ``read_changes_since``: re-seed via
  ``replicate.export_snapshot``.
- No per-trigger rate cap (Delta's ``maxFilesPerTrigger`` analog): the
  Python DS API's ``latestOffset()`` takes no start offset, so a cap
  tracked reader-side could regress below a restarted query's committed
  offset and break exactly-once. Until the API grows ReadLimit support,
  bound a large catch-up explicitly: repeated ``availableNow`` drains,
  or ``startingVersion`` stepping.

Reference parity note: the reference repo has no streaming surface at
all (single-process pandas ETL, ``main.py:228-264``); this closes the
CDC loop on the Spark side — stream in (``streaming/ingest.py``),
stream OUT (this module).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..schema import (
    DELETED_COL,
    LSN_COL,
    initial_default,
    physical_name,
    schema_from_manifest,
)

COMMIT_VERSION_COL = "_commit_version"

# Spark simpleString -> pyarrow factory args; kept to the types Spark's
# Arrow interchange maps 1:1 (the transcript payload types and then
# some). Anything else (arrays/structs/decimals) is rejected up front.
_ARROW_TOKENS = {
    "string": ("string",),
    "bigint": ("int64",),
    "int": ("int32",),
    "smallint": ("int16",),
    "tinyint": ("int8",),
    "double": ("float64",),
    "float": ("float32",),
    "boolean": ("bool_",),
    "timestamp": ("timestamp",),
    "date": ("date32",),
    "binary": ("binary",),
}


def _arrow_type(token: str):
    import pyarrow as pa

    if token == "timestamp":
        return pa.timestamp("us", tz="UTC")
    return getattr(pa, _ARROW_TOKENS[token][0])()


def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _current_version(root: str) -> int:
    with open(os.path.join(_meta_dir(root), "CURRENT")) as f:
        return int(f.read().strip())


def _earliest_version(root: str) -> int:
    """The oldest retained manifest — the table-creation snapshot unless
    retention GC expired it."""
    vs = [
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(_meta_dir(root), "v*.json"))
    ]
    if not vs:
        raise ValueError(f"no MiniLake table at {root!r}")
    return min(vs)


def _manifest(root: str, version: int) -> dict:
    path = os.path.join(_meta_dir(root), f"v{version:06d}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"manifest v{version} is gone (expired by retention GC) — "
            f"the stream fell behind the horizon; re-seed the consumer "
            f"from replicate.export_snapshot and restart from a live "
            f"version"
        ) from None


@dataclass
class _DirPartition(InputPartition):
    """One committed delta dir: the files plus the self-contained
    projection recipe (no engine imports needed executor-side)."""

    files: list = field(default_factory=list)
    # ordered output spec: (out_name, type_token, phys_name | None,
    # default | None) — phys_name None = column missing from these
    # files, emit default (or null)
    spec: list = field(default_factory=list)
    commit_version: int = 0


class _ChangesStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: T.StructType, start: int):
        self._root = root
        self._schema = schema
        self._start = start
        # logical field -> (physical name, type token, default) for
        # partition-spec construction; validated in __init__ so a bad
        # schema fails at query START, not mid-stream on an executor
        self._fields = []
        for f in schema.fields:
            # bookkeeping cols are appended by _dir_spec / read, not
            # part of the logical payload spec
            if f.name in (COMMIT_VERSION_COL, LSN_COL, DELETED_COL):
                continue
            token = f.dataType.simpleString()
            if token not in _ARROW_TOKENS:
                raise ValueError(
                    f"column {f.name!r}: type {token} is not supported "
                    f"by the streaming table source"
                )
            self._fields.append(
                (f.name, physical_name(f), token, initial_default(f))
            )

    # ------------------------------------------------------------ offsets

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self._root)}

    def partitions(self, start: dict, end: dict):
        seen = {
            d
            for ds in _manifest(self._root, start["version"])[
                "buckets"
            ].values()
            for d in ds
        }
        parts: list[_DirPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            for ds in _manifest(self._root, v)["buckets"].values():
                for d in ds:
                    if d in seen:
                        continue
                    seen.add(d)
                    if not os.path.basename(os.path.dirname(d)).startswith(
                        "commit-"
                    ):
                        continue  # compaction/rescale = maintenance
                    files = sorted(
                        os.path.join(d, n)
                        for n in os.listdir(d)
                        if n.endswith(".parquet")
                    )
                    if not files:
                        continue
                    parts.append(
                        _DirPartition(
                            files=files,
                            spec=self._dir_spec(files[0]),
                            commit_version=v,
                        )
                    )
        return parts

    def _dir_spec(self, probe_file: str) -> list:
        """The dir's projection recipe from ONE footer (a dir is written
        by a single job — one schema per dir), driver-side."""
        import pyarrow.parquet as pq

        md = pq.read_metadata(probe_file)
        present = {md.schema.column(i).name for i in range(md.num_columns)}
        spec = []
        for name, phys, token, default in self._fields:
            if phys in present:
                spec.append((name, token, phys, None))
            else:
                spec.append((name, token, None, default))
        for book, token in ((LSN_COL, "bigint"), (DELETED_COL, "boolean")):
            spec.append((book, token, book, None))
        return spec

    # --------------------------------------------------------------- read

    def read(self, partition: _DirPartition):
        """Executor-side: pyarrow scan of the dir's files, restructured
        to the pinned output schema, yielded as Arrow record batches —
        zero per-row Python."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        out_fields = [
            pa.field(name, _arrow_type(token))
            for name, token, _, _ in partition.spec
        ] + [pa.field(COMMIT_VERSION_COL, pa.int32())]
        out_schema = pa.schema(out_fields)
        wanted = [p for _, _, p, _ in partition.spec if p is not None]
        for path in partition.files:
            tbl = pq.read_table(path, columns=wanted)
            n = tbl.num_rows
            if n == 0:
                continue
            arrays = []
            for name, token, phys, default in partition.spec:
                typ = _arrow_type(token)
                if phys is not None:
                    col = tbl.column(phys)
                    if col.type != typ:
                        col = col.cast(typ)
                    arrays.append(col.combine_chunks())
                elif default is not None:
                    arrays.append(pa.array([default] * n).cast(typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            arrays.append(
                pa.array([partition.commit_version] * n, pa.int32())
            )
            for batch in pa.Table.from_arrays(
                arrays, schema=out_schema
            ).to_batches():
                yield batch

    def commit(self, end: dict) -> None:
        pass


class MiniLakeChangesDataSource(DataSource):
    """``spark.readStream.format("minilake_changes")`` — see the module
    docstring. Options:

    - ``path`` (required): the table root.
    - ``startingVersion``: serve changes committed AFTER this version.
      Default ``earliest`` (the oldest retained snapshot — the full
      history unless GC expired part of it); ``current`` at query
      start gives a changes-from-now tail.
    """

    @classmethod
    def name(cls) -> str:
        return "minilake_changes"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("option 'path' (the table root) is required")
        return root

    def schema(self) -> T.StructType:
        root = self._root()
        m = _manifest(root, _current_version(root))
        if m.get("merge_engine", "lww") != "lww":
            raise ValueError(
                "the streaming table source serves LWW tables only — "
                "partial/agg fold state has engine-specific change "
                "semantics; use read_changes_since batch exports"
            )
        logical = schema_from_manifest(m["schema"])
        return T.StructType(
            list(logical.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), False),
                T.StructField(DELETED_COL, T.BooleanType(), False),
                T.StructField(COMMIT_VERSION_COL, T.IntegerType(), False),
            ]
        )

    def streamReader(self, schema: T.StructType) -> _ChangesStreamReader:
        root = self._root()
        raw = self.options.get("startingVersion", "earliest")
        if raw == "current":
            start = _current_version(root)
        elif raw == "earliest":
            start = _earliest_version(root)
        else:
            start = int(raw)
        return _ChangesStreamReader(root, schema, start)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(MiniLakeChangesDataSource)
