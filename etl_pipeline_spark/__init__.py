"""etl_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference ETL pipeline (maybeitsai/etl-pipeline),
re-expressed Spark-first:

- binlog/WAL-style change stream (insert/update/delete events) applied as
  key-partitioned LWW MERGE upserts into an Iceberg-style lake table of
  multi-turn conversation transcripts keyed on ``(conv_id, turn_idx)``
- LSN-ordered last-writer-wins conflict resolution with tombstones
- exactly-once via batch-id-fenced atomic snapshot commits
- additive in-flight schema evolution
- vectorized Arrow/pandas UDFs for text cleaning (no per-row Python)
- Structured Streaming micro-batches with ``foreachBatch``
- per-batch lineage + throughput metrics

Plus the large-scale training-data operators a 100 TB pipeline needs:
exact/near dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding
similarity search, text quality analysis, and multimodal column plumbing.

Everything here derives from the public Apache Spark / PySpark API and the
reference's observable behavior only.
"""

__version__ = "0.1.0"
