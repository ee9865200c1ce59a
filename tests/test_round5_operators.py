"""Round-5 operators: pytest oracles for the keys declared rows-only
this round, starting with the approx profiler (round-4 verdict item 2).
"""

from __future__ import annotations

from lexam_data_pipeline_spark.plans.fixture_queries import (
    q_table_profile,
    q_table_profile_approx,
)


def test_table_profile_approx_tracks_exact_twin(spark, sf_small):
    """Per column: the HLL estimate is within 3% of the exact distinct
    count (rsd is 0.05; fixture cardinalities sit well inside it), and
    the non-approximated fields (n_rows, nulls, min, max) equal the
    exact profiler bit-for-bit."""
    exact = {r["column"]: r.asDict() for r in q_table_profile(spark, sf_small).collect()}
    approx = {
        r["column"]: r.asDict() for r in q_table_profile_approx(spark, sf_small).collect()
    }
    assert set(exact) == set(approx) and exact
    for col, e in exact.items():
        a = approx[col]
        for f in ("n_rows", "n_nulls", "min_value", "max_value"):
            assert a[f] == e[f], (col, f, a[f], e[f])
        rel = abs(a["approx_distinct"] - e["n_distinct"]) / max(e["n_distinct"], 1)
        assert rel <= 0.03, (col, a["approx_distinct"], e["n_distinct"], rel)


def test_table_profile_approx_plan_has_no_expand(spark, sf_small):
    """The point of the key: the exact profiler's multi-COUNT(DISTINCT)
    Expand (one row copy per profiled column) must be GONE from the
    approx plan — HLL sketches aggregate in one pass, one row copy."""
    exact_plan = q_table_profile(
        spark, sf_small
    )._jdf.queryExecution().executedPlan().toString()
    approx_plan = q_table_profile_approx(
        spark, sf_small
    )._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the documented 4.1× shuffle
    assert "Expand" not in approx_plan
