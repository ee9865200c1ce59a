"""Bucketed co-located joins (operators/bucketing.py): the plan-level
proof behind every "bucket by the key at write time → shuffle nothing"
claim in DEPLOY.md.  The join and the groupBy on the bucket key must
compile WITHOUT any shuffle Exchange, and results must equal the plain
parquet join exactly."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    is_exchange_free,
    write_bucketed,
)

N_BUCKETS = 8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fresh_tables(spark, *tables: str) -> None:
    """Crash-safe setup: drop each table AND remove its warehouse
    location before writing.  Teardown-only cleanup left a killed run's
    directory behind, and the next run's ``saveAsTable`` died with
    LOCATION_ALREADY_EXISTS (round-4 verdict item 4)."""
    warehouse = Path(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    )
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(warehouse / t, ignore_errors=True)


@pytest.fixture()
def bucketed_pair(spark, sf_small):
    """orders + customer bucketed by custkey under unique table names;
    dropped afterwards so the shared warehouse stays clean."""
    orders = load_table(spark, sf_small, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    lt, rt = "t_bucketed_orders", "t_bucketed_customer"
    _fresh_tables(spark, lt, rt)
    write_bucketed(orders, lt, "custkey", N_BUCKETS)
    write_bucketed(cust, rt, "custkey", N_BUCKETS)
    yield lt, rt, orders, cust
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_join_is_exchange_free_and_exact(spark, bucketed_pair):
    lt, rt, orders, cust = bucketed_pair
    # force the join strategy decision away from broadcast so the test
    # proves co-location, not small-table replication
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "custkey").select(
            "custkey", "o_orderkey", "c_name"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert is_exchange_free(joined), plan
        # bucketing visible at the scan
        assert "Bucketed: true" in plan
        # exactness vs the plain-parquet join
        want = sorted(
            (r["custkey"], r["o_orderkey"], r["c_name"])
            for r in orders.join(cust, "custkey")
            .select("custkey", "o_orderkey", "c_name")
            .collect()
        )
        got = sorted(
            (r["custkey"], r["o_orderkey"], r["c_name"]) for r in joined.collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groupby_on_bucket_key_skips_shuffle(spark, bucketed_pair):
    lt, _, orders, _ = bucketed_pair
    agg = spark.table(lt).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(agg)
    assert is_exchange_free(agg), plan
    want = {
        (r["custkey"], r["n"])
        for r in orders.groupBy("custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {(r["custkey"], r["n"]) for r in agg.collect()} == want


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, sf_small):
    """Negative control: different bucket counts can NOT co-locate, so
    the planner must re-introduce at least one Exchange — proving the
    green tests above really measure bucket alignment."""
    orders = load_table(spark, sf_small, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    lt, rt = "t_mismatch_orders", "t_mismatch_customer"
    _fresh_tables(spark, lt, rt)
    write_bucketed(orders, lt, "custkey", N_BUCKETS)
    write_bucketed(cust, rt, "custkey", 3)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "custkey")
        assert not is_exchange_free(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
