"""Per-batch lineage + throughput metrics.

Scaled-up analog of the reference's per-step row-count logging
(/root/reference/utils/transform.py:124-128,213-218,228-231 and
main.py:110-113): every applied micro-batch appends one JSON record to
the table's ``_lineage`` log — source offset range (min/max LSN, per
source partition), in/valid/dead-letter/applied counts per op, the commit
snapshot id, and wall-time throughput. Driver-side append of a single
small record per batch; readable back as a DataFrame for monitoring.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class LineageLog:
    def __init__(self, table_root: str):
        self.dir = os.path.join(table_root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "lineage.jsonl")

    def append(self, record: dict) -> None:
        record = {"logged_at": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.path)
