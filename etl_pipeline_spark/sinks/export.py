"""Flat-file export sinks (full refresh).

Spark-first take on the reference's CSV full-refresh sink
(/root/reference/utils/load.py:26-61: overwrite-on-save, skip empty,
header row, utf-8): ``mode("overwrite")`` IS the truncate+write,
executed by executors — one file per partition by default, so a 100 TB
export never funnels through the driver. ``single_file=True`` coalesces
to one CSV for the reference's literal one-file layout — debug scale
only, by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
    sep: str = ",",
    skip_empty: bool = True,
) -> bool:
    """CSV full refresh. Returns False (and writes nothing) for an empty
    frame when ``skip_empty`` — the reference's empty-DataFrame guard
    (load.py:38-40), which there protects the downstream sheet from a
    destructive truncate with no replacement rows."""
    if skip_empty and df.isEmpty():
        return False
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return True
