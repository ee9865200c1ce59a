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


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files sized
    for scan efficiency (the append-only sinks accumulate one file per
    micro-batch/stage write — the classic small-file problem at scale).

    Sizing is estimated from the current on-disk footprint; the rewrite
    goes through a temp dir + atomic swap like the experiment store.
    Returns the output file count."""
    import math
    import os
    import shutil
    import uuid

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
