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

_BATCH_RE = re.compile(r"batch-(\d+)\.parquet$")


def list_batch_files(changelog_dir: str) -> list[str]:
    """Ordered batch files in the changelog directory."""
    out = []
    for name in os.listdir(changelog_dir):
        m = _BATCH_RE.search(name)
        if m:
            out.append((int(m.group(1)), os.path.join(changelog_dir, name)))
    return [p for _, p in sorted(out)]


def read_events(
    spark: SparkSession, paths: str | list[str], with_schema: bool = True
) -> DataFrame:
    """Batch-read change events.

    With ``with_schema`` the superset schema is applied: Parquet files
    written before the schema-evolution point (no ``tool`` column) read
    that column as null — Spark's schema-projection behavior, no
    ``mergeSchema`` full-footer scan needed.
    """
    reader = spark.read
    if with_schema:
        reader = reader.schema(CHANGE_EVENT_SCHEMA)
    return reader.parquet(*([paths] if isinstance(paths, str) else paths))


def read_events_stream(
    spark: SparkSession,
    changelog_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming file source over the changelog directory.

    ``maxFilesPerTrigger`` bounds micro-batch size (the analog of the
    reference's one-page-at-a-time pacing, extract.py:238-239 — except
    ours is backpressure, not politeness sleep).
    """
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA).option(
        "latestFirst", "false"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(changelog_dir)
