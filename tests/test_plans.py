"""Physical-plan assertions (SURVEY §4): the optimizations the engine
depends on must be visible in the executed plan, not assumed.

* no row-at-a-time Python in any declared query (BatchEvalPython =
  interpreted Python UDF; Arrow stages show as ArrowEvalPython /
  MapInPandas and only in the explicitly-Python operators)
* predicate pushdown reaches the parquet scan where a filter exists
* dimension joins broadcast
"""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.plans.registry import build_queries

QUERIES = build_queries()

#: queries whose plans legitimately contain an Arrow Python stage
PYTHON_STAGES = {"q_multimodal_features", "q_dedup_embedding_blocked"}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_no_row_python_in_hot_path(spark, sf_small, key):
    plan = _plan(QUERIES[key](spark, sf_small))
    assert "BatchEvalPython" not in plan, f"{key} runs row-at-a-time Python"
    if key not in PYTHON_STAGES:
        assert "Python" not in plan, f"{key} unexpectedly leaves the JVM"


@pytest.mark.parametrize(
    "key,pushed_fragment",
    [
        ("q_filter_in", "In(l_returnflag"),
        ("q_semi_exists", "GreaterThan(o_totalprice"),
        ("q_search_contains", "p_name"),
        ("q_nest_children", "c_mktsegment"),
    ],
)
def test_filter_pushdown_reaches_scan(spark, sf_small, key, pushed_fragment):
    plan = _plan(QUERIES[key](spark, sf_small))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(pushed_fragment in ln for ln in pushed), (
        f"{key}: expected {pushed_fragment!r} in PushedFilters\n" + "\n".join(pushed)
    )


@pytest.mark.parametrize(
    "key", ["q_join_3way_agg", "q_join_enrich", "q_semi_exists", "q_anti_dedup"]
)
def test_dimension_joins_broadcast(spark, sf_small, key):
    plan = _plan(QUERIES[key](spark, sf_small))
    assert "BroadcastHashJoin" in plan, f"{key} should broadcast its dimension side"
    assert "SortMergeJoin" not in plan, f"{key} unexpectedly sort-merge joins at fixture scale"
