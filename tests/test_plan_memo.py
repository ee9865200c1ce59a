"""Guards for the analyzed-plan memo (plans/registry.MEMO_SAFE_KEYS).

The memo caches a PLAN, never data: eligibility requires that a key's
construction runs ZERO Spark jobs (a construct-time action would mean
collected values get frozen into the cached plan — result caching, which
the bench contract forbids).  These tests pin that invariant so a future
edit cannot silently add an action to a memoized key.
"""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.catalog import FIXTURE_TABLES, load_table
from lexam_data_pipeline_spark.operators.caching import _PLAN_MEMO
from lexam_data_pipeline_spark.plans.registry import MEMO_SAFE_KEYS, build_queries


@pytest.fixture(scope="module")
def warm_queries(spark, sf_small):
    # warm the table cache (first load of a table runs a footer-read job
    # that would otherwise count against the zero-jobs assertion)
    for t in FIXTURE_TABLES:
        load_table(spark, sf_small, t)
        load_table(spark, sf_small, t, fan=True)
    return build_queries()


def test_memo_safe_keys_construct_without_jobs(spark, sf_small, warm_queries, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_QOPT", raising=False)
    sc = spark.sparkContext
    for i, key in enumerate(MEMO_SAFE_KEYS):
        _PLAN_MEMO.clear()
        grp = f"memo-guard-{i}"
        sc.setJobGroup(grp, key)
        warm_queries[key](spark, sf_small)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(grp)
        assert not jobs, f"{key} ran {len(jobs)} job(s) at construction — not memo-safe"
    _PLAN_MEMO.clear()


def test_memo_returns_same_object_and_kill_switch(spark, sf_small, warm_queries, monkeypatch):
    key = MEMO_SAFE_KEYS[0]
    monkeypatch.delenv("SPARK_GRAFT_QOPT", raising=False)
    _PLAN_MEMO.clear()
    a = warm_queries[key](spark, sf_small)
    b = warm_queries[key](spark, sf_small)
    assert a is b, "second construction should hit the memo"
    monkeypatch.setenv("SPARK_GRAFT_QOPT", "0")
    c = warm_queries[key](spark, sf_small)
    assert c is not a, "kill-switch must bypass the memo"
    _PLAN_MEMO.clear()


def test_memo_is_scoped_per_sf_dir(spark, sf_small, sf_oracle, warm_queries, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_QOPT", raising=False)
    _PLAN_MEMO.clear()
    key = "q_fleiss_kappa"
    a = warm_queries[key](spark, sf_small)
    b = warm_queries[key](spark, sf_oracle)
    assert a is not b
    _PLAN_MEMO.clear()


def test_memoized_results_match_fresh_construction(spark, sf_small, warm_queries, monkeypatch):
    # memo hit must serve the identical rows a fresh construction computes
    key = "q_experiment_stats"
    monkeypatch.delenv("SPARK_GRAFT_QOPT", raising=False)
    _PLAN_MEMO.clear()
    warm_queries[key](spark, sf_small)  # populate
    memo_pd = warm_queries[key](spark, sf_small).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_QOPT", "0")
    fresh_pd = warm_queries[key](spark, sf_small).toPandas()
    assert memo_pd.equals(fresh_pd)
    _PLAN_MEMO.clear()
