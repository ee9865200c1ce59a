"""Storage-layout tests: partition pruning reaches the scan, bucketed
joins run with zero exchanges."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.sources.writers import (
    plan_has_exchange,
    write_bucketed_table,
    write_partitioned,
)


def test_partition_pruning(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"])
    # hive-style layout on disk
    assert sorted(
        d for d in os.listdir(path) if d.startswith("o_orderstatus=")
    ) == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]

    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:120]
    # pruned scan returns exactly the partition's rows
    expected = orders.filter(F.col("o_orderstatus") == "O").count()
    assert back.count() == expected


def test_bucketed_join_no_exchange(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 4, sort_col="o_orderkey")
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        4,
        sort_col="o_orderkey",
    )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        # force a non-broadcast join so co-location is what saves the shuffle
        joined = bo.hint("merge").join(bl, "o_orderkey")
        assert not plan_has_exchange(joined), "bucketed join must not shuffle"
        # same rows as the plain join
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain
        # the unbucketed form of the same merge join DOES shuffle
        unbucketed = orders.hint("merge").join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert plan_has_exchange(unbucketed)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_small_files(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    from lexam_data_pipeline_spark.sources.writers import compact

    orders = load_table(spark, sf_small, "orders")
    path = str(tmp_path / "fragmented")
    # simulate many tiny append files
    for i in range(6):
        orders.filter(F.col("o_orderkey") % 6 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before_files = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert before_files >= 6
    before_count = spark.read.parquet(path).count()

    compact(spark, path, target_file_bytes=1 << 30)  # everything into 1 file
    after_files = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert after_files == 1
    assert spark.read.parquet(path).count() == before_count
