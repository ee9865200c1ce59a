"""Scan fan-out (operators/partitioning + catalog.FANOUT_KEYS).

The fixture parquet files are single-row-group, so a raw scan is ONE
task; fan_out must widen it to the session's default parallelism — and
must be a strict no-op when the plan is already at least that wide
(the production multi-row-group case) so cluster plans never pay an
extra exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import FANOUT_KEYS, load_table
from lexam_data_pipeline_spark.operators.partitioning import fan_out


def test_fanout_widens_single_partition_scan(spark, sf_small):
    raw = spark.read.parquet(f"{sf_small}/orders.parquet")
    assert raw.rdd.getNumPartitions() == 1
    wide = fan_out(raw, "o_orderkey")
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_fanout_noop_when_already_wide(spark):
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n)
    assert fan_out(df, "id") is df
    wider = spark.range(0, 1000, 1, n + 3)
    assert fan_out(wider, "id") is wider


def test_fanout_preserves_rows_exactly(spark, sf_small):
    raw = spark.read.parquet(f"{sf_small}/orders.parquet")
    wide = fan_out(raw, "o_orderkey")
    assert sorted(map(tuple, raw.collect())) == sorted(map(tuple, wide.collect()))


def test_catalog_fan_is_per_call_opt_in(spark, sf_small):
    for name, key in FANOUT_KEYS.items():
        df = load_table(spark, sf_small, name, fan=True)
        assert key in df.columns
        assert (
            df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        ), name
        # default stays the raw scan (single partition on the fixture)
        raw = load_table(spark, sf_small, name)
        assert raw.rdd.getNumPartitions() == 1, name


def test_pushdown_survives_fanout(spark, sf_small):
    """Filter pushdown and column pruning must reach the parquet scan
    THROUGH the repartition (guide §6: PushedFilters / ReadSchema)."""
    df = (
        load_table(spark, sf_small, "lineitem", fan=True)
        .where(F.col("l_shipdate") >= "1995-01-01")
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
