"""Every declared query must survive EMPTY input tables (0 rows, real
schemas) — the cluster reality of empty partitions, fresh tables, and
filters that match nothing.  Found-and-fixed by this fuzz: 0/0 funnel
conversions under ANSI, k-means on an empty corpus (IVF and IVF-PQ),
and PageRank's 1/0 teleport on an empty graph."""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.catalog import FIXTURE_TABLES
from lexam_data_pipeline_spark.plans.registry import build_queries

QUERIES = build_queries()


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory) -> str:
    import duckdb

    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
            f" LIMIT 0) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("key", sorted(QUERIES))
@pytest.mark.slowsuite
def test_query_survives_empty_tables(spark, empty_sf_dir, key):
    # must not raise; row count is query-specific (aggregates may emit a
    # zero row, scans emit none) — surviving with a stable schema is the
    # contract
    df = QUERIES[key](spark, empty_sf_dir)
    assert df.columns  # schema intact
    df.collect()


@pytest.fixture(scope="session")
def constant_sf_dir(tmp_path_factory) -> str:
    """50 rows per table, all cloned from one row (documents get distinct
    ids so dedup has work): the all-duplicates / zero-variance world."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_const")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        if t == "documents":
            con.execute(
                "COPY (SELECT r.range AS doc_id, d.text, d.lang, d.source, d.n_chars"
                " FROM (SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet') LIMIT 1) d"
                f" CROSS JOIN range(50) r) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * EXCLUDE (range) FROM (SELECT * FROM"
                f" read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 1)"
                f" CROSS JOIN range(50)) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


@pytest.mark.slowsuite
def test_every_query_survives_constant_content(spark, constant_sf_dir):
    """Zero variance, 100% duplicates, one group everywhere — the
    degenerate statistics world (one consolidated pass: per-key
    parametrization would pay ~125 session fixtures)."""
    failures = []
    for key, fn in QUERIES.items():
        try:
            fn(spark, constant_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — collecting evidence
            failures.append(f"{key}: {type(exc).__name__}")
    assert not failures, failures
