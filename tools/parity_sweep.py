#!/usr/bin/env python
"""Oracle-parity sweep: run every `queries()` key against its DuckDB
`oracle_sql()` twin at one scale factor and report mismatches — the
in-repo mirror of the driver's correctness gate.

The external harness only verifies the first 50 registered keys per
round; this sweep covers ALL keys and writes the result to
``CORRECTNESS_SELF.json`` (driver-row format) so full-contract
verification is auditable in-repo.

Usage:
    python tools/parity_sweep.py                 # sf0.01 (driver's SF)
    python tools/parity_sweep.py /root/testdata/sf0.1
    python tools/parity_sweep.py SF_DIR OUT.json q_key1 q_key2   # subset
        (argv[3:] filters to the named keys — unknown names fail fast;
        a filtered run requires an explicit OUT so it can't clobber the
        committed full-sweep CORRECTNESS_SELF.json)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from lexam_data_pipeline_spark import testing  # noqa: E402
from lexam_data_pipeline_spark.plans.registry import (  # noqa: E402
    EXPECTED_QUERY_COUNT,
    build_queries,
    build_oracles,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("parity-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()
    assert len(queries) == EXPECTED_QUERY_COUNT, (len(queries), EXPECTED_QUERY_COUNT)
    if len(sys.argv) > 3:  # optional subset: fail fast on unknown names
        unknown = [k for k in sys.argv[3:] if k not in queries]
        assert not unknown, f"unknown keys: {unknown}"
        queries = {k: queries[k] for k in sys.argv[3:]}
    con = testing.duckdb_connection(sf_dir)
    failures = []
    rows: dict[str, dict] = {}
    t0 = time.time()
    for key in queries:  # registration order — same walk the driver does
        if key in oracles:
            try:
                result = testing.compare_query(
                    spark, con, key, queries[key], oracles[key], sf_dir
                )
                ok = result.ok
                rows[key] = {
                    "rows_match": result.spark_rows == result.oracle_rows,
                    "schema_match": not any("columns" in m for m in result.mismatches),
                    "hash_match": ok,
                    "spark_rows": result.spark_rows,
                    "oracle_rows": result.oracle_rows,
                    "err": None,
                }
            except Exception as exc:  # keep sweeping; report at the end
                ok, result = False, f"EXC {type(exc).__name__}: {exc}"
                rows[key] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": None,
                    "oracle_rows": None,
                    "err": str(result)[:500],
                }
            status = "ok" if ok else "FAIL"
            print(f"{status:4s} {key}: {str(result)[:160]}")
            if not ok:
                failures.append(key)
        else:
            try:
                n = queries[key](spark, sf_dir).count()
                rows[key] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": n,
                    "oracle_rows": None,
                    "err": None,
                }
                print(f"rows {key}: {n} rows (rows-only, no oracle)")
            except Exception as exc:
                rows[key] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"EXC {type(exc).__name__}: {exc}"[:500],
                }
                failures.append(key)
                print(f"FAIL {key}: {exc}")
    # optional 2nd arg: output filename (e.g. an sf0.1 evidence run that
    # must not clobber the committed sf0.01 CORRECTNESS_SELF.json)
    out = Path(REPO) / (sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_SELF.json")
    out.write_text(json.dumps({"sf_dir": sf_dir, "results": rows}, indent=1))
    n_oracled = sum(1 for k in queries if k in oracles)
    print(
        f"\n{n_oracled} oracle + {len(queries) - n_oracled} rows-only keys "
        f"at {sf_dir} in {round(time.time() - t0, 1)}s; failures: {failures or 'none'}"
        f"\nwrote {out}"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
