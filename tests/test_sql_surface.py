"""Every Spark SQL surface text must produce exactly its DataFrame
twin's rows (API parity: two front doors into one Catalyst plan)."""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.catalog import register_views
from lexam_data_pipeline_spark.plans.registry import build_queries
from lexam_data_pipeline_spark.plans.sql_surface import SQL_QUERIES

QUERIES = build_queries()


def _canon(df) -> list:
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


def test_every_sql_key_has_a_dataframe_twin():
    missing = set(SQL_QUERIES) - set(QUERIES)
    assert not missing, f"SQL surface keys without DataFrame twin: {missing}"


@pytest.mark.parametrize("key", sorted(SQL_QUERIES))
def test_sql_matches_dataframe_twin(spark, sf_small, key):
    register_views(spark, sf_small)
    sql_df = spark.sql(SQL_QUERIES[key])
    df = QUERIES[key](spark, sf_small)
    assert sorted(sql_df.columns) == sorted(df.columns), (
        sql_df.columns,
        df.columns,
    )
    assert _canon(sql_df) == _canon(df), f"{key}: SQL and DataFrame rows differ"


def test_surface_covers_80pct_of_core_oracled():
    """Round-7 bar (raised from round-5's 80%): the SQL door covers ≥90% of the
    SQL-oracled core contract (non-ML keys)."""
    from lexam_data_pipeline_spark.plans.oracles import CORE_ORACLES

    covered = sum(1 for k in SQL_QUERIES if k in CORE_ORACLES)
    assert covered / len(CORE_ORACLES) >= 0.90, (covered, len(CORE_ORACLES))


def test_surface_covers_88pct_of_all_oracled():
    """Round-8 bar: ≥88% of the FULL oracled contract (core + ML tiers)
    has a spark.sql front door (202/223 at round-8 close; the remainder
    needs constructs Spark SQL lacks — enumerated in the module
    docstring)."""
    from lexam_data_pipeline_spark.plans.registry import build_oracles

    oracles = build_oracles()
    covered = sum(1 for k in SQL_QUERIES if k in oracles)
    assert covered / len(oracles) >= 0.88, (covered, len(oracles))
