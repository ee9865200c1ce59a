"""Count-min sketch (ml/cms.py) and the approx-quantile error bound."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.cms import cms_build, cms_estimate, heavy_hitters


@pytest.fixture(scope="module")
def zipfy(spark):
    """Zipf-ish stream: key k_i appears ~30000/(i+1) times."""
    return spark.range(30000).select(
        F.concat(F.lit("k"), (F.lit(30000) / (F.col("id") + 1)).cast("int")).alias("k")
    )


def test_cms_never_underestimates(spark, zipfy):
    """The defining CMS guarantee — hash collisions only ADD.  Checked
    for every key, not a sample."""
    cms = cms_build(zipfy, F.col("k"))
    truth = zipfy.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(truth, F.col("k"), cms)
    bad = est.where(F.col("cms_est") < F.col("true_n")).count()
    assert bad == 0


def test_cms_estimate_close_for_heavy_keys(spark, zipfy):
    """Heavy keys must estimate within the εN additive bound (w=2048,
    N≈30k·H — generous 2x slack on e/w)."""
    cms = cms_build(zipfy, F.col("k"))
    n_total = zipfy.count()
    truth = zipfy.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(truth, F.col("k"), cms).where(F.col("true_n") >= 100)
    worst = est.select(F.max(F.col("cms_est") - F.col("true_n"))).collect()[0][0]
    assert worst <= 2 * 2.72 * n_total / 2048, worst


def test_heavy_hitters_exact(spark, zipfy):
    """Prefilter + confirm must equal the plain groupBy answer exactly."""
    got = {
        (r["k"], r["n"]) for r in heavy_hitters(zipfy, F.col("k"), 500).collect()
    }
    want = {
        (r["k"], r["n"])
        for r in zipfy.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 500)
        .collect()
    }
    assert got == want and got


def test_approx_quantiles_within_relative_bound(spark, sf_oracle):
    """percentile_approx at accuracy 10000 must land within 1% relative
    of the exact percentile on every (group, quantile) cell."""
    from lexam_data_pipeline_spark.plans.registry import build_queries

    approx = {
        r["flag"]: (r["p25"], r["p50"], r["p75"])
        for r in build_queries()["q_approx_quantiles"](spark, sf_oracle).collect()
    }
    li = load_table(spark, sf_oracle, "lineitem")
    exact = {
        r["flag"]: r["qs"]
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            ).alias("qs")
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, triple in approx.items():
        for got, want in zip(triple, exact[flag]):
            assert abs(got - want) / want < 0.01, (flag, got, want)
