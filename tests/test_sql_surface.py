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


#: the two O(n²) embedding twins cost ~50 s of the suite by themselves
#: (codegen of 64-term cosine chains on BOTH engines); their parity is
#: additionally pinned by the DuckDB oracle sweep, so they ride the
#: deselected-by-default slow tail.
_SLOW_TWINS = {"q_dedup_embedding", "q_dedup_embedding_blocked"}


@pytest.mark.parametrize(
    "key",
    [
        pytest.param(k, marks=pytest.mark.slowsuite) if k in _SLOW_TWINS else k
        for k in sorted(SQL_QUERIES)
    ],
)
def test_sql_matches_dataframe_twin(spark, sf_small, key):
    register_views(spark, sf_small)
    sql_df = spark.sql(SQL_QUERIES[key])
    df = QUERIES[key](spark, sf_small)
    assert sorted(sql_df.columns) == sorted(df.columns), (
        sql_df.columns,
        df.columns,
    )
    assert _canon(sql_df) == _canon(df), f"{key}: SQL and DataFrame rows differ"


def test_surface_covers_all_core_oracled():
    """Round-8 bar (raised from round-7's 90%): the SQL door covers EVERY
    SQL-oracled core-contract key (non-ML keys)."""
    from lexam_data_pipeline_spark.plans.oracles import CORE_ORACLES

    covered = sum(1 for k in SQL_QUERIES if k in CORE_ORACLES)
    assert covered == len(CORE_ORACLES), (covered, len(CORE_ORACLES))


def test_surface_covers_every_oracled_key():
    """Round-9 bar (raised from round-8's ≥97%): EVERY oracled key —
    core and ML tiers — has a spark.sql front door.  The last four
    DataFrame-only keys closed this round: the cluster pair via the
    linear-reference unrolled min-label text, the embedding pair via
    hand-written 0-based balanced-tree texts."""
    from lexam_data_pipeline_spark.plans.registry import build_oracles

    oracles = build_oracles()
    missing = sorted(set(oracles) - set(SQL_QUERIES))
    assert missing == [], missing
