"""Every declared query must match its DuckDB oracle (driver t2 mirror)."""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.plans.registry import build_oracles, build_queries
from lexam_data_pipeline_spark.testing import compare_query, duckdb_connection

QUERIES = build_queries()
ORACLES = build_oracles()


@pytest.fixture(scope="module")
def con(sf_small):
    con = duckdb_connection(sf_small)
    yield con
    con.close()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle keys without query implementation: {missing}"


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(spark, con, sf_small, key):
    res = compare_query(spark, con, key, QUERIES[key], ORACLES[key], sf_small)
    assert res.ok, str(res)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_small, key):
    df = QUERIES[key](spark, sf_small)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_sql_surface_via_registered_views(spark, sf_small):
    """The spark.sql(...) surface: register_views + a plain SQL query must
    agree with the DataFrame API plan on the same tables."""
    from pyspark.sql import functions as F

    from lexam_data_pipeline_spark.catalog import load_table, register_views

    register_views(spark, sf_small)
    sql_rows = {
        (r["o_orderstatus"], r["n"], round(r["total"], 2))
        for r in spark.sql(
            """SELECT o_orderstatus, count(*) AS n,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
               FROM orders GROUP BY 1"""
        ).collect()
    }
    df_rows = {
        (r["o_orderstatus"], r["n"], round(r["total"], 2))
        for r in load_table(spark, sf_small, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert sql_rows == df_rows
