"""partitioned_prefix_sum must be VALUE-IDENTICAL to the global-window
cumulative sum (it reassociates exact addition only) while keeping the
fact-side exchange range-partitioned instead of single-partition."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.operators.prefix import (
    PREFIX_COL,
    partitioned_prefix_sum,
)


def _global_cum(df, order_cols, value_col):
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(PREFIX_COL, F.sum(value_col).over(w))


def _as_map(df, key_col):
    return {r[key_col]: r[PREFIX_COL] for r in df.collect()}


def test_matches_global_window_on_part_rollup(spark, sf_small):
    """The ABC-classification input shape: per-part revenue cents
    cumulated by (cents desc, partkey)."""
    li = load_table(spark, sf_small, "lineitem")
    rollup = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    order = [F.desc("cents"), F.asc("l_partkey")]
    got = partitioned_prefix_sum(rollup, order, "cents", num_partitions=7)
    want = _global_cum(rollup, order, "cents")
    assert _as_map(got, "l_partkey") == _as_map(want, "l_partkey")


def test_matches_on_negatives_and_single_partition(spark):
    rows = [(i, (-1) ** i * (i * 7 % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v long")
    got = partitioned_prefix_sum(df, ["k"], "v", num_partitions=5)
    want = _global_cum(df, ["k"], "v")
    assert _as_map(got, "k") == _as_map(want, "k")
    # degenerate: everything in one range partition still works
    got1 = partitioned_prefix_sum(df, ["k"], "v", num_partitions=1)
    assert _as_map(got1, "k") == _as_map(want, "k")


def test_empty_input(spark):
    df = spark.createDataFrame([], "k int, v long")
    assert partitioned_prefix_sum(df, ["k"], "v").count() == 0


def test_fact_side_exchange_is_range_partitioned(spark, sf_small):
    """Plan shape pins: the range exchange runs ONCE, eagerly, at the
    localCheckpoint — so the downstream plan reads `Scan ExistingRDD`
    and contains NO rangepartitioning at all (a rangepartitioning here
    would mean a branch re-executed the exchange and could sample
    different boundaries — the divergent-__pid hazard); SinglePartition
    hops stay confined to the O(#partitions) offset cascade (≤ 2: its
    window sort + the broadcast build); the fact window is keyed by
    __pid, never the empty-partition-spec single-task global shape."""
    li = load_table(spark, sf_small, "lineitem")
    rollup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    plan = (
        partitioned_prefix_sum(rollup, ["l_partkey"], "n", num_partitions=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("rangepartitioning") == 0, plan
    assert plan.count("Exchange SinglePartition") <= 2, plan
    for line in plan.splitlines():
        if "Window" in line and "__local_cum" in line:
            assert "__pid" in line, line


def test_output_schema_adds_only_prefix_col(spark):
    """No internal column (__pid/__local_cum/__offset/...) may leak into
    the returned schema (round-6 third review pass)."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v long")
    out = partitioned_prefix_sum(df, ["k"], "v", num_partitions=2)
    assert sorted(out.columns) == sorted(["k", "v", PREFIX_COL])


def test_null_values_match_global_window(spark):
    """NULL handling must be value-identical to the global window: sums
    skip NULLs, and the running value is NULL only before the FIRST
    non-NULL in the total order — including when an entire range
    partition's prefix is NULL (round-6 third review pass: the naive
    per-partition sum emitted NULL there instead of the carried-in
    running value)."""
    rows = [
        (0, None), (1, 5), (2, 3), (3, None), (4, 2), (5, None), (6, 1),
        (7, None), (8, None), (9, 4),
    ]
    df = spark.createDataFrame(rows, "k int, v long")
    want = _as_map(_global_cum(df, ["k"], "v"), "k")
    for parts in (1, 2, 3, 5):
        got = _as_map(
            partitioned_prefix_sum(df, ["k"], "v", num_partitions=parts), "k"
        )
        assert got == want, (parts, got, want)
    # leading NULLs stay NULL on both formulations
    assert want[0] is None

def test_reserved_column_collision_raises(spark):
    """Caller columns matching the operator's working names must error,
    not be silently overwritten (round-6 advice)."""
    import pytest

    df = spark.createDataFrame([(1, 2, 3)], "k int, v long, cum_value long")
    with pytest.raises(ValueError, match="cum_value"):
        partitioned_prefix_sum(df, ["k"], "v")
    df2 = spark.createDataFrame([(1, 2, 3)], "k int, v long, __pid int")
    with pytest.raises(ValueError, match="__pid"):
        partitioned_prefix_sum(df2, ["k"], "v")


def test_reliable_checkpoint_requires_dir_then_matches(spark, tmp_path):
    """reliable_checkpoint=True errors without a checkpoint dir, and
    once one is set it produces the same values as the default path."""
    import pytest

    rows = [(i, i * 3 % 11) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, v long")
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    with pytest.raises(ValueError, match="setCheckpointDir"):
        partitioned_prefix_sum(df, ["k"], "v", reliable_checkpoint=True)
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        got = partitioned_prefix_sum(
            df, ["k"], "v", num_partitions=4, reliable_checkpoint=True
        )
        want = _global_cum(df, ["k"], "v")
        assert _as_map(got, "k") == _as_map(want, "k")
    finally:
        # other tests assert the default (no checkpoint dir) behavior
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
