#!/usr/bin/env python
"""Interleaved A/B of SPARK_GRAFT_QOPT (round-11 query-shape
optimizations) for named bench keys.

Same protocol as tools/ab_fanout.py: the host shows roving
multi-second stalls, so the two variants run alternately in ONE
session and the per-variant min is compared — drift hits both
variants equally.  OFF = SPARK_GRAFT_QOPT=0 (pre-optimization shape),
ON = env unset (shipped shape).

    python tools/ab_qopt.py q_kruskal_wallis q_questions_page [--rounds 3]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from lexam_data_pipeline_spark.operators.caching import release_all  # noqa: E402
from lexam_data_pipeline_spark.plans.registry import build_queries  # noqa: E402
from lexam_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    rounds = 3
    keys = []
    skip_next = False
    for a in sys.argv[1:]:
        if skip_next:  # the VALUE of --rounds is not a bench key (r11 ADVICE)
            rounds = int(a)
            skip_next = False
        elif a == "--rounds":
            skip_next = True
        elif not a.startswith("--"):
            keys.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-qopt")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    def run(name: str, opt: bool) -> float:
        if opt:
            os.environ.pop("SPARK_GRAFT_QOPT", None)
        else:
            os.environ["SPARK_GRAFT_QOPT"] = "0"
        spark.sparkContext.setJobDescription(f"{name} qopt={opt}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_all()
        spark.sparkContext._jvm.System.gc()
        return elapsed

    spark.range(10).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in keys:
        if name not in queries:
            out[name] = "unknown key"
            continue
        run(name, False)  # codegen warmup for both shapes
        run(name, True)
        offs, ons = [], []
        for _ in range(rounds):
            offs.append(round(run(name, False), 3))
            ons.append(round(run(name, True), 3))
        out[name] = {"off_min": min(offs), "on_min": min(ons), "off": offs, "on": ons}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
