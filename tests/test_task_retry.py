"""ST3 under REAL Spark task retries (not stream re-delivery): a map
stage whose first attempt per partition CRASHES must still produce
exactly-once results through the deterministic-id + anti-join sink.

Runs in a subprocess because it needs its own SparkContext
(``local[4, 2]`` — maxFailures=2 — the shared test session can't be
reconfigured)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r'''
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from lexam_data_pipeline_spark.pipeline.generation import run_generation
from tests.lexam_data import lexam_tables
from tests.test_pipeline import EXPERIMENT, MOCK_MCQ

marker_dir = tempfile.mkdtemp(prefix="retry-markers-")
spark = (SparkSession.builder.master("local[4, 2]")  # task maxFailures=2
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
t = lexam_tables(spark)

answers = run_generation(EXPERIMENT, t["variants"], t["questions"],
                         client_spec=MOCK_MCQ, parallelism=4)

# wrap the final stage with a crash-once-per-partition map: first attempt
# of each partition dies AFTER producing some rows (the dangerous case -
# partial work discarded and retried)
md = marker_dir
def crash_once(it):
    from pyspark import TaskContext
    ctx = TaskContext.get()
    marker = os.path.join(md, f"p{{ctx.partitionId()}}")
    first = not os.path.exists(marker)
    if first:
        open(marker, "w").close()
    for i, row in enumerate(it):
        if first and i >= 1:
            raise RuntimeError("injected task failure")
        yield row

out = spark.createDataFrame(answers.rdd.mapPartitions(crash_once), answers.schema)
rows = out.collect()
ids = [r["id"] for r in rows]
assert len(rows) == 20, f"expected 20 rows, got {{len(rows)}}"
assert len(set(ids)) == 20, "duplicate answer ids after task retry"
letters = sorted(r["extracted_letter"] for r in rows if r["extracted_letter"])
assert len(letters) == 12
print("RETRY-TEST-OK", len(rows))
spark.stop()
'''


def test_exactly_once_under_task_retries():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(REPO),
    )
    assert "RETRY-TEST-OK 20" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
