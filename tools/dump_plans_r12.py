#!/usr/bin/env python
"""Dump before/after `.explain("formatted")` for round-12 qopt-touched
keys.

"before" = SPARK_GRAFT_QOPT=0 (the r11 query shapes); "after" = env
unset (shipped r12 shapes: one-pass dedup-sweep aggregates, CC
observe-fusion, analyzed-plan memo).  One session, caches released
between keys, output to plans/r12/.  For MEMO_SAFE_KEYS the two dumps
are expected to be IDENTICAL modulo expression ids — the memo caches
the analyzed plan, it does not change it; for the CC keys the fusion
lives in construct-time job counts, not the returned frame's plan
(the r11 kruskal precedent).

    python tools/dump_plans_r12.py q_dedup_threshold_sweep ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lexam_data_pipeline_spark.operators.caching import (  # noqa: E402
    _PLAN_MEMO,
    release_all,
)
from lexam_data_pipeline_spark.plans.registry import build_queries  # noqa: E402
from lexam_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = REPO / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    for suffix, env in (("before", "0"), ("after", None)):
        if env is None:
            os.environ.pop("SPARK_GRAFT_QOPT", None)
        else:
            os.environ["SPARK_GRAFT_QOPT"] = env
        _PLAN_MEMO.clear()
        for key in keys:
            if key not in queries:
                print(f"unknown key {key!r}", file=sys.stderr)
                continue
            buf = io.StringIO()
            with redirect_stdout(buf):
                queries[key](spark, sf_dir).explain(mode="formatted")
            (out_dir / f"{key}_{suffix}.txt").write_text(buf.getvalue())
            release_all()
            print(f"{key}_{suffix}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
