"""Bucketed tables: co-located joins and aggregates with ZERO shuffle.

The deployment docs (DEPLOY.md, operators/merge.py, streaming state
stores) repeatedly prescribe "bucket the table by its key at write time
so the join/MERGE shuffles nothing" — this module is that prescription
as code, plus the plan-level proof (tests/test_bucketing.py asserts the
joins compile WITHOUT a single Exchange).

How Spark bucketing works (public semantics, Spark SQL docs):

* ``df.write.bucketBy(n, key).sortBy(key).saveAsTable(t)`` hashes each
  row's key with Murmur3 into ``n`` buckets; every bucket is its own
  file set, and the table's metadata records (key, n).
* A join of two tables bucketed by the SAME key into the SAME bucket
  count satisfies both sides' ``HashClusteredDistribution`` straight
  from the scan — Catalyst plans a SortMergeJoin with NO Exchange on
  either side; with ``sortBy`` the per-bucket sort is also free.
* A groupBy on the bucket key likewise skips its Exchange.

At 100 TB this converts the nightly fact⋈fact join from a 2×table
network shuffle into a purely local merge — the single biggest shuffle
line-item in DEPLOY.md's budget table.  The cost is paid once at write
time (the bucketing write itself shuffles by key) and amortized over
every subsequent join/aggregate.

Bucketed tables live in the session catalog (``saveAsTable``) because
bucket metadata is what lets the planner trust the layout; plain
``parquet(path)`` writes cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sorted_within: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table — the one-time shuffle that buys shuffle-free joins
    and aggregates on ``key`` forever after."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sorted_within:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-key same-bucket-count tables; with bucketing
    metadata present this plans as an Exchange-free SortMergeJoin
    (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def is_exchange_free(df: DataFrame) -> bool:
    """True when the physical plan contains no shuffle Exchange — the
    property bucketing exists to deliver.  (BroadcastExchange does not
    count: it is a replication, not a repartitioning.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return not any(
        line.strip().startswith(("Exchange", "+- Exchange", ":- Exchange"))
        or "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        or "Exchange SinglePartition" in line
        for line in plan.splitlines()
    )
