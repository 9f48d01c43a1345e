"""Mixed-format changelog ingestion: a feed whose history spans CSV →
JSONL → Parquet batches must replay to the identical table state."""

from __future__ import annotations

import csv
import json

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.schema import TRANSCRIPT_SCHEMA
from etl_pipeline_spark.sources.changelog import list_batch_files, read_events
from etl_pipeline_spark.streaming.ingest import replay_files

ROWS = [
    # lsn, op, conv_id, turn_idx, role, text, tool, ts
    (1, "I", "c1", 0, "user", "hello", None, "2025-01-01 00:00:01"),
    (2, "I", "c1", 1, "assistant", "hi, there", None, "2025-01-01 00:00:02"),
    (3, "I", "c2", 0, "user", "start", None, "2025-01-01 00:00:03"),
    (4, "U", "c1", 1, "assistant", "hi again", "search", "2025-01-01 00:00:04"),
    (5, "D", "c2", 0, None, None, None, "2025-01-01 00:00:05"),
    (6, "I", "c3", 0, "user", "late", None, "2025-01-01 00:00:06"),
]
COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(COLS)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(dict(zip(COLS, r))) + "\n")


def _mixed_changelog(spark, root):
    root.mkdir()
    _write_csv(str(root / "batch-000000.csv"), ROWS[:2])
    _write_jsonl(str(root / "batch-000001.jsonl"), ROWS[2:4])
    spark.createDataFrame(
        [ROWS[4], ROWS[5]],
        "lsn long, op string, conv_id string, turn_idx int, role string,"
        " text string, tool string, ts string",
    ).selectExpr(
        "lsn", "op", "conv_id", "turn_idx", "role", "text", "tool",
        "CAST(ts AS TIMESTAMP) AS ts",
    ).coalesce(1).write.parquet(str(root / "_tmp"))
    import glob
    import shutil

    part = glob.glob(str(root / "_tmp" / "part-*.parquet"))[0]
    shutil.move(part, str(root / "batch-000002.parquet"))
    shutil.rmtree(str(root / "_tmp"))
    return str(root)


def test_mixed_format_listing_and_read(spark, tmp_path):
    clog = _mixed_changelog(spark, tmp_path / "clog")
    files = list_batch_files(clog)
    assert [f.rsplit(".", 1)[-1] for f in files] == ["csv", "jsonl", "parquet"]
    df = read_events(spark, files)
    assert df.count() == 6
    rows = {r["lsn"]: r for r in df.collect()}
    # CSV: typed lsn/turn_idx, empty string -> null tool
    assert rows[1]["turn_idx"] == 0 and rows[1]["tool"] is None
    # JSONL: evolution column present
    assert rows[4]["tool"] == "search"
    # timestamps parsed identically across formats
    assert rows[1]["ts"] is not None and rows[5]["ts"] is not None


def test_mixed_format_replay_matches_parquet_only_replay(spark, tmp_path):
    clog = _mixed_changelog(spark, tmp_path / "clog")
    table = MiniLakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    replay_files(spark, clog, table)
    state = {(r["conv_id"], r["turn_idx"]): r for r in table.read().collect()}
    assert set(state) == {("c1", 0), ("c1", 1), ("c3", 0)}  # c2 tombstoned
    assert state[("c1", 1)]["text"] == "hi again"
    assert state[("c1", 1)]["tool"] == "search"
