"""Round-5 operators: pytest oracles for the keys declared rows-only
this round, starting with the approx profiler (round-4 verdict item 2).
"""

from __future__ import annotations

from lexam_data_pipeline_spark.plans.fixture_queries import (
    q_table_profile,
    q_table_profile_approx,
)


def test_table_profile_approx_tracks_exact_twin(spark, sf_small):
    """Per column: the HLL estimate (rsd 0.01) is within 3% of the exact distinct
    count, and
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


def test_poisson_constants_in_sync():
    """The oracle's inlined Poisson CDF thresholds must equal the
    Spark plan's POISSON_CDF_HEX — and both must be the true Poisson(1)
    CDF floored at 16^6."""
    import math

    from lexam_data_pipeline_spark.plans.fixture_queries import POISSON_CDF_HEX
    from lexam_data_pipeline_spark.plans.oracles import _POISSON_HEX

    assert POISSON_CDF_HEX == _POISSON_HEX
    cdf = 0.0
    for k, h in enumerate(POISSON_CDF_HEX):
        cdf += math.exp(-1.0) / math.factorial(k)
        assert h == format(math.floor(cdf * 16**6), "06x")


def test_bootstrap_ci_brackets_true_mean(spark, sf_small):
    """The 95% CI must bracket the true corpus mean on fixture data,
    replicate means must be distinct (weights actually vary), and the
    run must be deterministic across invocations."""
    from pyspark.sql import functions as F

    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.plans.fixture_queries import q_bootstrap_ci

    r1 = q_bootstrap_ci(spark, sf_small).collect()[0]
    r2 = q_bootstrap_ci(spark, sf_small).collect()[0]
    assert r1 == r2  # pure function of the keys
    true_mean = (
        load_table(spark, sf_small, "orders")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) / F.count(F.lit(1)))
            .cast("double")
            .alias("m")
        )
        .collect()[0]["m"]
    )
    assert r1["n_replicates"] == 32
    assert r1["ci_lo"] < true_mean < r1["ci_hi"]
    assert r1["ci_lo"] < r1["boot_median"] < r1["ci_hi"]


def test_topic_keywords_matches_numpy_replica(spark, sf_small):
    """Independent numpy reimplementation of the informative-Dirichlet
    log-odds z (Monroe et al.) from raw pandas token counts: same
    keyword ranking, scores within float tolerance."""
    import numpy as np

    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.plans.fixture_queries import (
        TOPIC_PRIOR,
        TOPIC_TOP_K,
        q_topic_keywords,
    )

    got = q_topic_keywords(spark, sf_small).collect()
    docs = load_table(spark, sf_small, "documents").select("source", "text").collect()
    counts: dict = {}
    for r in docs:
        for w in (r["text"] or "").strip().lower().split():
            if w:
                counts[(r["source"], w)] = counts.get((r["source"], w), 0) + 1
    w_tot: dict = {}
    s_tot: dict = {}
    for (s, w), c in counts.items():
        w_tot[w] = w_tot.get(w, 0) + c
        s_tot[s] = s_tot.get(s, 0) + c
    n_all = sum(s_tot.values())
    a0 = TOPIC_PRIOR
    expect: dict = {}
    for (s, w), c in counts.items():
        y_rw = w_tot[w] - c
        n_s, n_r = s_tot[s], n_all - s_tot[s]
        delta = np.log((c + a0) / (n_s + 2 * a0 - c - a0)) - np.log(
            (y_rw + a0) / (n_r + 2 * a0 - y_rw - a0)
        )
        z = delta / np.sqrt(1.0 / (c + a0) + 1.0 / (y_rw + a0))
        expect.setdefault(s, []).append((-z, w, c))
    for s in expect:
        expect[s].sort()
    by_source: dict = {}
    for row in got:
        by_source.setdefault(row["source"], []).append(row)
    assert set(by_source) == set(expect)
    for s, rows in by_source.items():
        assert [r["rank"] for r in rows] == list(range(1, TOPIC_TOP_K + 1))
        for r, (neg_z, w, c) in zip(rows, expect[s][:TOPIC_TOP_K]):
            assert r["word"] == w, (s, r["word"], w)
            assert r["n_in_source"] == c
            assert abs(r["log_odds_z"] - (-neg_z)) < 1e-6, (s, w)


def test_sprt_constants_in_sync():
    """The oracle's inlined SPRT literals must be exactly the Spark
    plan's driver-computed constants."""
    import math

    from lexam_data_pipeline_spark.plans.fixture_queries import SPRT_P0, SPRT_P1
    from lexam_data_pipeline_spark.plans.oracles import CORE_ORACLES

    sql = CORE_ORACLES["q_ab_sequential"]
    assert repr(math.log(SPRT_P1 / SPRT_P0)) in sql
    assert repr(math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))) in sql
    assert str(int(math.floor(math.log(19.0) * 1e9))) in sql
