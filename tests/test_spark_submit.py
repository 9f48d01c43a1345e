"""The north-rule launch surface, exercised for real: package the engine
as ``engine.zip``, launch ``run_ingest.py`` through ``spark-submit
--py-files`` from a NEUTRAL working directory (the repo neither on
PYTHONPATH nor the cwd — only the shipped zip provides the package),
replay a seeded changelog, then verify the resulting on-disk table
against the independent oracle from this test session. This is the
same invocation shape a multi-executor cluster deployment uses; only
the master URL differs."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pandas as pd
import pytest

from etl_pipeline_spark.lake.minilake import MiniLakeTable
from etl_pipeline_spark.sources.genlog import (
    GenConfig,
    expected_final_state,
    generate_delivered_events,
    write_changelog,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def _engine_zip(dest: str) -> str:
    zpath = os.path.join(dest, "engine.zip")
    pkg = os.path.join(REPO, "etl_pipeline_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_replay_matches_oracle(spark, tmp_path):
    cfg = GenConfig(
        n_events=4_000, batch_size=1_000, shuffle_window=100,
        dup_delivery_rate=0.02,
    )
    clog = str(tmp_path / "clog")
    write_changelog(cfg, clog)

    # neutral launch dir: driver script copied OUT of the repo, so its
    # own sys.path bootstrap points at tmp, and the package can only
    # come from the --py-files zip (driver AND executors)
    driver = str(tmp_path / "run_ingest.py")
    shutil.copy(os.path.join(REPO, "run_ingest.py"), driver)
    zpath = _engine_zip(str(tmp_path))
    table_dir = str(tmp_path / "table")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing but the zip provides the pkg
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("SPARK_GRAFT_CPUS", None)

    proc = subprocess.run(
        [
            _spark_submit(), "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath, driver,
            "--changelog", clog, "--table", table_dir,
            "--mode", "replay", "--master", "local[4]",
            "--n-buckets", "8", "--lineage-level", "batch",
            "--files-per-trigger", "1",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    n_files = len(
        [p for p in os.listdir(clog) if p.startswith("batch-")]
    )
    assert summary["batches_applied"] == n_files
    assert summary["events_applied"] == len(generate_delivered_events(cfg))

    # verify the table the SUBPROCESS wrote, from this session
    table = MiniLakeTable(spark, table_dir)
    exp = expected_final_state(generate_delivered_events(cfg))
    got = (
        table.read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert len(got) == len(exp) == summary["live_rows"]
    a = ["∅" if pd.isna(x) else x for x in got["text"]]
    b = ["∅" if pd.isna(x) else x for x in exp["text"]]
    assert a == b
