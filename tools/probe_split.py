#!/usr/bin/env python
"""Construct / first-exec / re-exec split probe for bench keys.

For each key: time (1) building the DataFrame (driver-side Python +
any construct-time actions), (2) the first noop write of that object
(Catalyst analysis of the write plan + codegen + execution), (3) a
second noop write of the SAME object (execution + re-plan of an
already-analyzed tree).  The split says whether a key is driver-bound
(1 or 2-minus-3 dominates) or data-bound (3 dominates) — guide §1 /
OPTIMIZATION_r11.md finding 2.

    python tools/probe_split.py q_item_similarity q_experiment_stats
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
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-split")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm JVM/codegen + Arrow worker pool
    try:
        queries[keys[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc}", file=sys.stderr)
    release_all()
    spark.range(10).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in keys:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        construct = time.perf_counter() - t0
        first = noop(df)
        second = noop(df)
        third = noop(df)
        release_all()
        spark.sparkContext._jvm.System.gc()
        print(
            json.dumps(
                {
                    name: {
                        "construct": round(construct, 3),
                        "first_exec": round(first, 3),
                        "re_exec": round(second, 3),
                        "re_exec2": round(third, 3),
                    }
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
