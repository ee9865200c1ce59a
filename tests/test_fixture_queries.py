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
