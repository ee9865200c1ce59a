#!/usr/bin/env python
"""10×-scale (≈sf1) spot-bench of the heaviest keys with scan fan-out
ON vs OFF (r11 VERDICT item 7).

Builds the deterministic 10× fixture via tools/scale_probe.build_scaled
(unions of sf0.1 with id offsets — written as multi-file parquet, so
scans start at ~10 partitions instead of 1), then times each key with
the shipped site-mode fan config (ON) vs SPARK_GRAFT_SCAN_FANOUT=0
(OFF), interleaved in one session per the r11 noise protocol.

    python tools/sf1_fan_probe.py [--rounds 2] [keys...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from lexam_data_pipeline_spark import catalog  # noqa: E402
from lexam_data_pipeline_spark.operators.caching import (  # noqa: E402
    _PLAN_MEMO,
    release_all,
)
from lexam_data_pipeline_spark.plans.registry import build_queries  # noqa: E402
from lexam_data_pipeline_spark.session import get_spark  # noqa: E402
from tools.scale_probe import SCALE_DIR, build_scaled  # noqa: E402

DEFAULT_KEYS = [
    "q_bootstrap_ci",
    "q_spearman_corr",
    "q_multimodal_features",
    "q_kruskal_wallis",
    "q_boosted_stumps",
    "q_random_projection",
    "q_dedup_clusters",
    "q_dedup_clusters_two_phase",
    "q_item_similarity",
    "q_pagerank",
]


def main() -> int:
    rounds = 2
    keys = []
    skip_next = False
    for a in sys.argv[1:]:
        if skip_next:  # the VALUE of --rounds is not a key
            rounds = int(a)
            skip_next = False
        elif a == "--rounds":
            skip_next = True
        elif not a.startswith("--"):
            keys.append(a)
    keys = keys or DEFAULT_KEYS
    spark = get_spark(app_name="sf1-fan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(SCALE_DIR, "lineitem.parquet")):
        build_scaled(spark)
    queries = build_queries()

    def run(name: str, fan_on: bool) -> float:
        if fan_on:
            os.environ.pop("SPARK_GRAFT_SCAN_FANOUT", None)
        else:
            os.environ["SPARK_GRAFT_SCAN_FANOUT"] = "0"
        catalog._TABLE_CACHE.clear()
        _PLAN_MEMO.clear()
        spark.sparkContext.setJobDescription(f"sf1 {name} fan={fan_on}")
        t0 = time.perf_counter()
        queries[name](spark, SCALE_DIR).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_all()
        spark.sparkContext._jvm.System.gc()
        return round(elapsed, 3)

    spark.range(10).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in keys:
        if name not in queries:
            out[name] = "unknown key"
            continue
        run(name, False)
        run(name, True)  # codegen warmup, both shapes
        offs, ons = [], []
        for _ in range(rounds):
            offs.append(run(name, False))
            ons.append(run(name, True))
        out[name] = {"off_min": min(offs), "on_min": min(ons), "off": offs, "on": ons}
        print(json.dumps({name: out[name]}), flush=True)
    with open(os.path.join(REPO, "plans", "r12", "sf1_probe.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
