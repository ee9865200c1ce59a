"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 3-way-join aggregate on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2.11 (plus
the training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
twin for each SQL-expressible key.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lexam_data_pipeline_spark.plans.fixture_queries import q_join_3way_agg

    return q_join_3way_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lexam_data_pipeline_spark.plans.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible key in queries()."""
    from lexam_data_pipeline_spark.plans.registry import build_oracles

    return build_oracles()
