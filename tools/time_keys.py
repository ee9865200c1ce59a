#!/usr/bin/env python
"""Quiet re-timer for individual bench keys with bench.py's EXACT
harness: same session factory, noop sink, release_all + forced GC
between queries, per-key min over N runs (default 2).

    python tools/time_keys.py q_bootstrap_ci q_spearman_corr [--runs 3]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-keys")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_all()
        spark.sparkContext._jvm.System.gc()
        return elapsed

    # warm up JVM/codegen + the Arrow worker pool like bench.py does
    try:
        run(args[0])
    except Exception as exc:  # noqa: BLE001
        print(f"warmup {args[0]} failed: {exc}", file=sys.stderr)
    spark.range(10).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, object] = {}
    for name in args:
        if name not in queries:
            out[name] = "unknown key"
            continue
        try:
            samples = [round(run(name), 4) for _ in range(runs)]
            out[name] = {"min": min(samples), "runs": samples}
        except Exception as exc:  # noqa: BLE001
            out[name] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
