"""The driver runs ``python bench.py`` per round and parses ONE JSON
line — protect that contract (keys, types, query coverage) at the small
scale factor so the round-end gate can't break silently."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_prints_one_json_line(tmp_path):
    # redirect the full artifact: the smoke run must neither clobber the
    # committed sf0.1 BENCH_SELF.json nor be validated against it
    # (round-6 review, both passes)
    bench_out = str(tmp_path / "bench_full.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_OUT=bench_out,
        # smoke cap: the full ~240-key set outgrew this test's timeout
        # at sf0.001; the driver's round-end run is uncapped.  40 keys
        # keep every contract assertion live (n_queries >= 25) at ~2/3
        # the wall cost of the previous 60 (suite-budget, r12).
        SPARK_GRAFT_BENCH_LIMIT="40",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(REPO),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, f"expected exactly one JSON line:\n{proc.stdout}"
    # The driver records only the last ~2000 stdout chars and json-parses
    # them; the printed line must therefore stay compact (slowest-15
    # queries + headline metrics) while BENCH_SELF.json carries the full
    # per-query dict.
    assert len(json_lines[0]) < 1950, "compact line must fit the driver's tail window"
    d = json.loads(json_lines[0])
    assert d["metric"] == "headline_queries_total_runtime"
    assert d["unit"] == "sec" and isinstance(d["value"], float)
    assert d["sf"] == 0.001
    assert 0 < len(d["queries"]) <= 15
    assert d["n_queries"] >= 25
    assert all(isinstance(v, float) and v >= 0 for v in d["queries"].values())
    full = json.loads(Path(bench_out).read_text())
    assert full["sf"] == 0.001
    assert len(full["queries"]) == d["n_queries"]
    assert abs(sum(full["queries"].values()) - full["value"]) < 0.01
    assert set(d["queries"]) <= set(full["queries"])
    # the committed headline artifact stays the sf0.1 run
    committed = json.loads((REPO / "BENCH_SELF.json").read_text())
    assert committed["sf"] == 0.1


def test_registry_complete_from_bare_interpreter():
    """The full contract must materialize from a fresh interpreter with a
    non-repo cwd (the driver's context): a broken ML import would silently
    drop 7+ keys (round-1: those keys got no correctness row)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from lexam_data_pipeline_spark.plans.registry import ("
        "build_queries, build_oracles, EXPECTED_QUERY_COUNT)\n"
        "q, o = build_queries(), build_oracles()\n"
        "assert len(q) == EXPECTED_QUERY_COUNT, (len(q), EXPECTED_QUERY_COUNT)\n"
        "assert set(o) <= set(q), set(o) - set(q)\n"
        "print(len(q), len(o))\n" % str(REPO)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ERROR" not in proc.stderr, proc.stderr[-2000:]


def test_driver_priority_window():
    """The external harness verifies the FIRST 50 registered keys; the
    curated DRIVER_PRIORITY window must stay exactly 50, all resolvable,
    and emitted first by build_queries()."""
    from lexam_data_pipeline_spark.plans.registry import (
        DRIVER_PRIORITY,
        build_queries,
    )

    q = build_queries()
    assert len(DRIVER_PRIORITY) == 50
    assert list(q)[:50] == list(DRIVER_PRIORITY)
    missing = [k for k in DRIVER_PRIORITY if k not in q]
    assert not missing, missing
