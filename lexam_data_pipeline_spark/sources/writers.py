"""Write-side layout operators (SURVEY §4).

The reference's performance story is Postgres B-tree indexes on the
filter columns (models.py:13-21).  The Spark analog is layout at write
time:

* ``write_partitioned`` — hive-style partition directories on the
  low-cardinality filter columns (config/area/language in LEXam terms).
  Readers get *partition pruning*: a filtered scan lists only matching
  directories — the plan shows it under ``PartitionFilters``.
* ``write_bucketed_table`` — pre-shuffled bucket files on a join key.
  Two tables bucketed the same way join with NO exchange on either side
  (check: the join subtree has no ``Exchange`` node) — the co-located
  join for repeated large⋈large joins, e.g. answers⋈variants at corpus
  scale.

Partition-column choice is a cardinality question: partitions must stay
in the thousands (directory listing cost), buckets in the tens-to-
hundreds per table (small-file pressure vs parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    *,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucketing requires the table catalog; a
    plain parquet path cannot carry bucket metadata)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table, format="parquet")


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle — the assertion
    primitive for co-location tests."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()
