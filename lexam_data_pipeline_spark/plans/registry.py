"""Registry assembling the full declared-query contract.

``QUERIES`` maps every implemented query key to a ``(spark, sf_dir) →
DataFrame`` callable; ``ORACLES`` maps the SQL-expressible subset to DuckDB
oracle SQL.  Keys without an oracle get the driver's weaker rows-only
check (documented per key in the owning module).
"""

from __future__ import annotations

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


def build_queries() -> dict[str, QueryFn]:
    queries: dict[str, QueryFn] = dict(CORE_QUERIES)
    # Extension operator families (dedup / similarity / text analysis /
    # multimodal) register lazily so a bug in one module can't take down
    # the core contract.
    try:
        from lexam_data_pipeline_spark.ml.registry import ML_QUERIES

        queries.update(ML_QUERIES)
    except ImportError:
        pass
    return queries


def build_oracles() -> dict[str, str]:
    oracles = dict(CORE_ORACLES)
    try:
        from lexam_data_pipeline_spark.ml.registry import ML_ORACLES

        oracles.update(ML_ORACLES)
    except ImportError:
        pass
    return oracles
