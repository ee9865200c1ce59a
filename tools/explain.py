#!/usr/bin/env python
"""Print the optimized + physical plan for any declared query key.

The `.explain('formatted')` iterate-until-it's-the-plan-you-want loop,
as a one-liner (also the generator for PLANS.md evidence):

    python tools/explain.py q_join_5way_region
    python tools/explain.py q_kcore_prune /root/testdata/sf0.1 simple
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from lexam_data_pipeline_spark.plans.registry import build_queries  # noqa: E402
from lexam_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        queries = build_queries()
        print(f"usage: explain.py <key> [sf_dir] [mode]\n{len(queries)} keys:")
        print("  " + "\n  ".join(queries))
        return 1
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mode = sys.argv[3] if len(sys.argv) > 3 else "formatted"
    spark = get_spark(app_name=f"explain-{key}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    if key not in queries:
        print(f"unknown key {key!r}; run with no args for the list")
        return 1
    queries[key](spark, sf_dir).explain(mode=mode)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
