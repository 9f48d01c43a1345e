"""Change-log source readers (batch and Structured Streaming).

The changelog directory holds ordered Parquet batch files
(``batch-000000.parquet``, ...) — the binlog/WAL analog of the
reference's ordered page feed (/root/reference/utils/extract.py:191-246,
one page = one micro-batch). Ordering is carried by the ``lsn`` column,
never by arrival, so out-of-order and duplicate delivery are tolerated
by the LWW apply path.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..schema import CHANGE_EVENT_SCHEMA

_BATCH_RE = re.compile(r"batch-(\d+)\.(parquet|jsonl|csv)$")


def list_batch_files(changelog_dir: str) -> list[str]:
    """Ordered batch files in the changelog directory. Formats may be
    mixed (a feed that migrated from CSV dumps to Parquet keeps its
    history readable)."""
    out = []
    for name in os.listdir(changelog_dir):
        m = _BATCH_RE.search(name)
        if m:
            out.append((int(m.group(1)), os.path.join(changelog_dir, name)))
    return [p for _, p in sorted(out)]


def _fmt(path: str) -> str:
    return path.rsplit(".", 1)[-1]


def read_events(
    spark: SparkSession, paths: str | list[str], with_schema: bool = True
) -> DataFrame:
    """Batch-read change events (Parquet, JSONL or CSV batch files).

    With ``with_schema`` the superset schema is applied: files written
    before the schema-evolution point (no ``tool`` column) read that
    column as null — Spark's schema-projection behavior, no
    ``mergeSchema`` full-footer scan needed. JSONL/CSV always take the
    explicit schema (never inferSchema — inference is a second full scan
    and non-deterministic on dirty feeds; the declared contract is the
    reference's fixed-schema rule, transform.py:139-165).
    """
    path_list = [paths] if isinstance(paths, str) else list(paths)
    by_fmt: dict[str, list[str]] = {}
    for p in path_list:
        by_fmt.setdefault(_fmt(p), []).append(p)
    parts: list[DataFrame] = []
    for fmt, group in sorted(by_fmt.items()):
        reader = spark.read
        if with_schema or fmt != "parquet":
            reader = reader.schema(CHANGE_EVENT_SCHEMA)
        if fmt == "parquet":
            parts.append(reader.parquet(*group))
        elif fmt == "jsonl":
            parts.append(
                reader.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(*group)
            )
        elif fmt == "csv":
            parts.append(
                reader.option("header", "true")
                .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
                .option("nullValue", "")
                .csv(*group)
            )
        else:  # pragma: no cover - regex guards extensions
            raise ValueError(f"unsupported changelog format: {fmt}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_events_stream(
    spark: SparkSession,
    changelog_dir: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """Structured Streaming file source over the changelog directory.

    ``maxFilesPerTrigger`` bounds micro-batch size (the analog of the
    reference's one-page-at-a-time pacing, extract.py:238-239 — except
    ours is backpressure, not politeness sleep).

    ``schema`` overrides the read schema (default: the superset
    CHANGE_EVENT_SCHEMA) — the evolving ingest driver passes the
    footer-reconciled schema here on every (re)start.
    """
    reader = spark.readStream.schema(schema or CHANGE_EVENT_SCHEMA).option(
        "latestFirst", "false"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(changelog_dir)
