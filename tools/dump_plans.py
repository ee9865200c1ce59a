#!/usr/bin/env python
"""Dump before/after `.explain("formatted")` for fan-out-touched keys.

"before" = SPARK_GRAFT_SCAN_FANOUT=0 (the r10 plan shape, fan-out
forced off); "after" = env unset (shipped per-call-site opt-ins).
One session, table cache busted between modes, output to plans/r11/.

    python tools/dump_plans.py q_agg_stats q_corr_stats ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lexam_data_pipeline_spark import catalog  # noqa: E402
from lexam_data_pipeline_spark.operators.caching import release_all  # noqa: E402
from lexam_data_pipeline_spark.plans.registry import build_queries  # noqa: E402
from lexam_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = REPO / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans-r11")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    for suffix, env in (("before", "0"), ("after", None)):
        if env is None:
            os.environ.pop("SPARK_GRAFT_SCAN_FANOUT", None)
        else:
            os.environ["SPARK_GRAFT_SCAN_FANOUT"] = env
        catalog._TABLE_CACHE.clear()
        for key in keys:
            if key not in queries:
                print(f"unknown key {key!r}", file=sys.stderr)
                continue
            buf = io.StringIO()
            with redirect_stdout(buf):
                queries[key](spark, sf_dir).explain(mode="formatted")
            (out_dir / f"{key}_{suffix}.txt").write_text(buf.getvalue())
            release_all()
            print(f"wrote {key}_{suffix}.txt", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
