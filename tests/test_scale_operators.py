"""Scale-path operator tests: salting correctness (result-identical to
the unsalted plan) and approx-aggregate error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.operators.approx import distinct_count, percentile_agg
from lexam_data_pipeline_spark.operators.skew import salted_count, salted_join


def test_salted_count_matches_plain(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    plain = {
        (r["o_orderstatus"], r["count"])
        for r in orders.groupBy("o_orderstatus").count().collect()
    }
    salted = {
        (r["o_orderstatus"], r["count"])
        for r in salted_count(
            orders, ["o_orderstatus"], F.col("o_orderkey"), n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    cust = load_table(spark, sf_oracle, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        "c_custkey",
        salt_source=F.col("o_orderkey"),
        n_salts=8,
    )
    assert salted.count() == plain
    # no duplicate or lost rows per key
    per_key_plain = {
        (r["c_custkey"], r["count"])
        for r in orders.groupBy(F.col("o_custkey").alias("c_custkey")).count().collect()
    }
    per_key_salted = {
        (r["c_custkey"], r["count"]) for r in salted.groupBy("c_custkey").count().collect()
    }
    assert per_key_salted == per_key_plain


def test_salt_deterministic(spark, sf_oracle):
    """Task retries must re-derive identical salts — no rand()."""
    from lexam_data_pipeline_spark.operators.skew import with_salt

    orders = load_table(spark, sf_oracle, "orders").limit(100)
    a = [(r["o_orderkey"], r["__salt"]) for r in with_salt(orders, F.col("o_orderkey"), 8).collect()]
    b = [(r["o_orderkey"], r["__salt"]) for r in with_salt(orders, F.col("o_orderkey"), 8).collect()]
    assert sorted(a) == sorted(b)


def test_approx_percentile_within_bound(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    exact, approx = li.agg(
        percentile_agg("l_extendedprice", 0.5, exact=True).alias("e"),
        percentile_agg("l_extendedprice", 0.5, exact=False).alias("a"),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.01


def test_approx_count_distinct_within_rsd(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    exact, approx = orders.agg(
        distinct_count("o_custkey", exact=True).alias("e"),
        distinct_count("o_custkey", exact=False, rsd=0.02).alias("a"),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.06  # 3× rsd safety margin


def test_hll_distinct_within_3pct_of_exact(spark, sf_oracle):
    """q_hll_distinct's sketch estimate must land within 3% of the exact
    per-status distinct count (lgConfigK=14 ≈ 0.8% RSE)."""
    from lexam_data_pipeline_spark.plans.fixture_queries import q_hll_distinct
    from lexam_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    est = {
        r["status"]: r["approx_distinct_custkeys"]
        for r in q_hll_distinct(spark, sf_oracle).collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, sf_oracle, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for s_, e in est.items():
        assert abs(e - exact[s_]) / exact[s_] <= 0.03, (s_, e, exact[s_])


class TestMadApprox:
    """q_outlier_mad_approx: the verified 100 TB switch for the exact
    per-group-percentile MAD plan (round-3 verdict item 3)."""

    def test_default_accuracy_tight_bound(self, spark, sf_oracle):
        """At the default accuracy (rank error ≤ 1e-4) the approx twin
        must track the exact plan to within 0.1% on median and MAD and
        within 0.5% of rows on the outlier count.  (Not exact equality:
        exact ``percentile`` linearly interpolates between neighbours,
        ``percentile_approx`` returns an actual data value.)"""
        from lexam_data_pipeline_spark.operators.robust import (
            mad_outliers,
            mad_outliers_approx,
        )

        li = load_table(spark, sf_oracle, "lineitem")
        exact = {r["g"]: r.asDict() for r in mad_outliers(li, "l_returnflag", "l_extendedprice").collect()}
        approx = {r["g"]: r.asDict() for r in mad_outliers_approx(li, "l_returnflag", "l_extendedprice").collect()}
        assert set(exact) == set(approx)
        for g, e in exact.items():
            a = approx[g]
            assert a["n_rows"] == e["n_rows"]
            assert abs(a["median_value"] - e["median_value"]) / e["median_value"] < 0.001
            assert abs(a["mad_value"] - e["mad_value"]) / e["mad_value"] < 0.001
            assert abs(a["n_outliers"] - e["n_outliers"]) <= 0.005 * e["n_rows"]

    def test_coarse_accuracy_bounded_deviation(self, spark, sf_oracle):
        """At deliberately coarse accuracy the rank error is ≤ 1/accuracy,
        so the approx median may drift but stays within the percentile
        neighbourhood: median within 5% of exact, outlier count within
        20% relative (outliers are tail counts — more sensitive)."""
        from lexam_data_pipeline_spark.operators.robust import (
            mad_outliers,
            mad_outliers_approx,
        )

        li = load_table(spark, sf_oracle, "lineitem")
        exact = {r["g"]: r.asDict() for r in mad_outliers(li, "l_returnflag", "l_extendedprice").collect()}
        approx = {r["g"]: r.asDict() for r in mad_outliers_approx(li, "l_returnflag", "l_extendedprice", accuracy=100).collect()}
        assert set(exact) == set(approx)
        for g, e in exact.items():
            a = approx[g]
            assert a["n_rows"] == e["n_rows"]
            assert abs(a["median_value"] - e["median_value"]) / e["median_value"] < 0.05
            denom = max(e["n_outliers"], 1)
            assert abs(a["n_outliers"] - e["n_outliers"]) / denom < 0.20

    def test_fixture_query_tracks_exact_twin(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_outlier_mad,
            q_outlier_mad_approx,
        )

        exact = {r["l_returnflag"]: r.asDict() for r in q_outlier_mad(spark, sf_oracle).collect()}
        approx = {r["l_returnflag"]: r.asDict() for r in q_outlier_mad_approx(spark, sf_oracle).collect()}
        assert set(exact) == set(approx)
        for g, e in exact.items():
            a = approx[g]
            assert a["n_rows"] == e["n_rows"]
            assert abs(a["median_value"] - e["median_value"]) / e["median_value"] < 0.001
            assert abs(a["n_outliers"] - e["n_outliers"]) <= 0.005 * e["n_rows"]

    def test_no_window_exchange_in_plan(self, spark, sf_oracle):
        """The scale property itself: the approx plan must contain NO
        window operator (the exact plan's group-materializing step) —
        only partial-aggregatable hash aggregates + broadcast joins."""
        from lexam_data_pipeline_spark.plans.fixture_queries import q_outlier_mad_approx

        plan = q_outlier_mad_approx(spark, sf_oracle)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan


def test_hll_merge_windows_lossless_and_within_3pct(spark, sf_oracle):
    """The daily-sketch → weekly-union rollup must (a) equal a single
    direct weekly sketch (pre-aggregation adds no error) and (b) land
    within 3% of the exact weekly distinct count."""
    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.plans.fixture_queries import q_hll_merge_windows

    merged = {
        r["week"]: r["approx_distinct_users"]
        for r in q_hll_merge_windows(spark, sf_oracle).collect()
    }
    ev = load_table(spark, sf_oracle, "events")
    direct = ev.groupBy(
        F.date_trunc("week", F.date_trunc("day", "ts")).alias("week")
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), F.lit(14)))
        .cast("bigint")
        .alias("est"),
        F.count_distinct("user_id").alias("exact"),
    )
    rows = direct.collect()
    assert set(merged) == {r["week"] for r in rows}
    for r in rows:
        assert merged[r["week"]] == r["est"], "sketch merge must be lossless"
        assert abs(merged[r["week"]] - r["exact"]) <= max(1, 0.03 * r["exact"])
