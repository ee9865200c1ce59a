"""Registry assembling the full declared-query contract.

``QUERIES`` maps every implemented query key to a ``(spark, sf_dir) →
DataFrame`` callable; ``ORACLES`` maps the SQL-expressible subset to DuckDB
oracle SQL.  Keys without an oracle get the driver's weaker rows-only
check (documented per key in the owning module).
"""

from __future__ import annotations

import sys
import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lexam_data_pipeline_spark.plans import fixture_queries as fq
from lexam_data_pipeline_spark.plans.oracles import CORE_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]

CORE_QUERIES: dict[str, QueryFn] = {
    name: fn
    for name, fn in vars(fq).items()
    if name.startswith("q_") and callable(fn)
}


#: total registered query keys; tests/test_bench_contract.py asserts the
#: registry reaches this count from a bare interpreter, so a broken ML
#: import can't silently shrink the contract (round-1 lesson: 7 keys had
#: no driver correctness row).
EXPECTED_QUERY_COUNT = 76


def _ml_module(name: str):
    """Import one symbol from ml.registry, loudly.

    The lazy import keeps a bug in an extension family from taking down
    the core contract, but a failure must never be silent — it would
    drop every ML key from the driver's correctness run.
    """
    try:
        import lexam_data_pipeline_spark.ml.registry as mlr

        return getattr(mlr, name)
    except Exception:
        print(
            f"ERROR: ml.registry import failed — ML query keys DROPPED ({name})",
            file=sys.stderr,
        )
        traceback.print_exc()
        return None


def build_queries() -> dict[str, QueryFn]:
    queries: dict[str, QueryFn] = dict(CORE_QUERIES)
    ml_queries = _ml_module("ML_QUERIES")
    if ml_queries:
        queries.update(ml_queries)
    return queries


def build_oracles() -> dict[str, str]:
    oracles = dict(CORE_ORACLES)
    ml_oracles = _ml_module("ML_ORACLES")
    if ml_oracles:
        oracles.update(ml_oracles)
    return oracles
