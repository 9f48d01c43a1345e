"""Streaming ingest drivers.

Two drivers share the same :func:`etl_pipeline_spark.pipeline.apply_batch`
path (the semantics live in one place):

- :func:`run_ingest_stream` — **Structured Streaming**: file source over
  the changelog dir, ``foreachBatch(apply_batch)``, checkpointed offsets,
  ``trigger(availableNow=True)`` for bounded replay / continuous triggers
  for tailing. Exactly-once = source checkpoint (offset replay) × sink
  fence (batch-id highwater in the snapshot) — either alone survives a
  crash, together they survive a crash *between* sink commit and
  checkpoint write (the classic double-apply window).
- :func:`replay_files` — bounded replay over the ordered batch files with
  **per-batch schema inference**, so a Parquet-schema birth of a new
  column (the FIXTURES.md §5 evolution fixture) is observed exactly when
  it happens in the stream, not at stream start. Resume comes from the
  sink fence alone (the lake *is* the checkpoint).

The reference analog is the page loop with skip-and-continue
(/root/reference/utils/extract.py:206-235): one page = one micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..lake.lineage import LineageLog
from ..lake.minilake import MiniLakeTable
from ..pipeline import ApplyConfig, apply_batch
from ..sources.changelog import list_batch_files, read_events, read_events_stream


def run_ingest_stream(
    spark: SparkSession,
    changelog_dir: str,
    table: MiniLakeTable,
    checkpoint_dir: str,
    cfg: ApplyConfig | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    await_termination: bool = True,
) -> StreamingQuery:
    """Structured Streaming ingest with foreachBatch MERGE.

    Note on evolution: the file source needs a fixed read schema, so this
    path reads with the superset CHANGE_EVENT_SCHEMA (pre-evolution files
    project the missing column as null). True schema-birth detection is
    exercised through :func:`replay_files`; on a real deployment the
    schema registry feeding the stream plays this role.
    """
    lineage = LineageLog(table.root)
    events = read_events_stream(spark, changelog_dir, max_files_per_trigger)
    # Fence lineage = this checkpoint: Structured Streaming guarantees a
    # stable batch-id <-> offset-range mapping only within one checkpoint.
    stream_id = f"ckpt:{os.path.abspath(checkpoint_dir)}"

    def _apply(batch_df, batch_id: int) -> None:
        apply_batch(
            table, batch_df, batch_id, cfg=cfg, lineage=lineage,
            stream_id=stream_id,
        )

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"ingest-{table.root.rstrip('/').rsplit('/', 1)[-1]}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def replay_files(
    spark: SparkSession,
    changelog_dir: str,
    table: MiniLakeTable,
    cfg: ApplyConfig | None = None,
    files_per_batch: int = 1,
    start_batch: int | None = None,
    stop_after: int | None = None,
) -> int:
    """Bounded replay: ordered batch files → micro-batches, schema
    inferred per batch (true in-flight column birth). Idempotent and
    resumable purely via the sink fence — replaying from batch 0 after a
    crash re-skips everything already committed. Returns batches applied.

    ``stop_after`` applies N batches then returns (crash-simulation hook
    for the resume tests).
    """
    lineage = LineageLog(table.root)
    stream_id = f"replay:{os.path.abspath(changelog_dir)}:k{files_per_batch}"
    files = list_batch_files(changelog_dir)
    batches = [
        files[i : i + files_per_batch] for i in range(0, len(files), files_per_batch)
    ]
    applied = 0
    first = start_batch or 0
    for batch_id, group in enumerate(batches):
        if batch_id < first:
            continue
        if stop_after is not None and applied >= stop_after:
            break
        if all(p.endswith(".parquet") for p in group):
            batch_df = spark.read.parquet(*group)  # per-batch inferred schema
        else:
            # JSONL/CSV batches carry no self-describing schema — read with
            # the declared superset contract (schema birth stays a
            # Parquet-era feature; text feeds are fixed-schema by decree,
            # the reference's rule at transform.py:139-165).
            batch_df = read_events(spark, group)
        apply_batch(
            table, batch_df, batch_id, cfg=cfg, lineage=lineage,
            stream_id=stream_id,
        )
        applied += 1
    return applied
