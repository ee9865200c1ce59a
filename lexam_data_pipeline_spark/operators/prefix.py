"""Distributed ordered prefix sums — the 100 TB switch for global
cumulative windows.

A cumulative sum over a GLOBAL ordering (``Window.orderBy(...)`` with no
partitionBy) funnels every row through ONE task: correct, and fine when
the input is a dimension rollup (parts, customers), but a wall once the
rollup itself is hundreds of millions of rows.  The classic fix is the
two-phase range-partitioned prefix sum:

1. ``repartitionByRange(order keys)`` — rows land in partitions that are
   globally ordered BETWEEN partitions (RangePartitioner samples the
   keys; partition boundaries are data-dependent but the VALUES below
   are exact regardless of where the cuts land), then the assignment is
   PINNED with an eager ``localCheckpoint`` so every consumer sees one
   consistent ``__pid`` (see inline note);
2. a per-partition cumulative window (``partitionBy(partition id)``) —
   bounded state, all partitions in parallel.  Spark re-clusters by
   hash(__pid) for the window (one extra parallel exchange of the
   already-reduced rollup — the cost is visibility-tested, and it is a
   PARALLEL shuffle, unlike the single-task global window this
   replaces);
3. per-partition totals, cumulated over the O(#partitions) offset table
   (the only SinglePartition hop — bounded by cluster size, not data),
   broadcast back as each partition's offset.

``partitioned_prefix_sum`` is the verified switch referenced by
``q_abc_classification`` / ``q_percent_rank_spend``'s scale notes:
``tests/test_prefix_sum.py`` proves VALUE-IDENTITY with the
single-window formulation on fixtures and asserts the plan contains no
single-partition global-sort window.

Reference framing: the reference computes its running rollups in Python
over ORDER BY'd Postgres rows (backend/app/main.py) — a single-node
scan; this operator is the shape that survives a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: output column added by :func:`partitioned_prefix_sum`.
PREFIX_COL = "cum_value"

#: working columns the operator adds then drops; caller columns with
#: these names would be silently overwritten by withColumn/drop, so the
#: function rejects them at entry (round-6 advice).
_RESERVED_COLS = frozenset(
    {PREFIX_COL, "__pid", "__local_cum", "__local_cnt", "__offset", "__offcnt"}
)


def partitioned_prefix_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    *,
    num_partitions: int | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """``df`` + a :data:`PREFIX_COL` column holding the running sum of
    ``value_col`` over the TOTAL order given by ``order_cols`` — without
    a global single-partition window.

    ``order_cols`` must be a total order (include a unique tiebreak) or
    ties make "running" ambiguous; this matches the contract of the
    window formulation it replaces.  The value column must be exact
    (integer/decimal) — the per-partition sums and the offset cascade
    reassociate the addition, which is only order-independent for exact
    types (the same rule every moment aggregate in this repo follows).
    NULL values follow the global window's semantics exactly: they are
    skipped by the sum, and the running value is NULL only while NO
    non-NULL value has been seen anywhere earlier in the total order
    (tracked with a parallel running count — tested).

    ``reliable_checkpoint=True`` pins the partition assignment with a
    RELIABLE ``df.checkpoint()`` (replicated to the configured
    ``sparkContext.setCheckpointDir`` storage) instead of the default
    eager ``localCheckpoint``.  The default stores unreplicated
    executor-local blocks for the FULL fact-side data, so on a long
    1000-executor run a single executor loss fails the whole job; the
    reliable variant survives executor loss at the cost of a
    distributed-storage write.  Raises if no checkpoint dir is set —
    silently falling back to the fragile path would defeat the point.
    """
    clash = _RESERVED_COLS.intersection(df.columns)
    if clash:
        raise ValueError(
            "partitioned_prefix_sum would overwrite caller column(s) "
            f"{sorted(clash)}; rename them before calling (reserved: "
            f"{sorted(_RESERVED_COLS)})"
        )
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # PIN the partition assignment: __pid is consumed by TWO lineage
    # branches (the local window and the offset aggregate).  Without the
    # checkpoint each branch re-executes its own range exchange, and
    # RangePartitioner's sampled boundaries are not guaranteed identical
    # across exchanges — a boundary row could land in different __pids
    # per branch and the offsets would silently mis-key (round-6 review
    # finding).  localCheckpoint truncates lineage to the materialized
    # blocks, so both branches read the SAME assignment; a lost block
    # fails the job loudly instead of recomputing differently.
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    if reliable_checkpoint:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "reliable_checkpoint=True requires "
                "sparkContext.setCheckpointDir(...) to be configured"
            )
        with_pid = with_pid.checkpoint(eager=True)
    else:
        with_pid = with_pid.localCheckpoint(eager=True)
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # __local_cnt mirrors the global window's NULL semantics exactly:
    # sum() ignores NULLs, and the GLOBAL cumulative sum is NULL iff no
    # non-NULL value precedes — which the per-partition sum alone cannot
    # see (a partition whose prefix is all-NULL would emit NULL even
    # when earlier partitions carried real values; round-6 review).
    local = with_pid.withColumn(
        "__local_cum", F.sum(value_col).over(w_in)
    ).withColumn("__local_cnt", F.count(value_col).over(w_in))
    # O(#partitions) offset table: total per partition, cumulated over
    # pid with an exclusive frame, broadcast back.  pid order IS the
    # global order because repartitionByRange assigns ascending ranges
    # to ascending partition ids.
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("__pid")
        .agg(
            F.sum(value_col).alias("__ptotal"),
            F.count(value_col).alias("__pcnt"),
        )
        .withColumn("__offset", F.coalesce(F.sum("__ptotal").over(w_off), F.lit(0)))
        .withColumn("__offcnt", F.coalesce(F.sum("__pcnt").over(w_off), F.lit(0)))
        .select("__pid", "__offset", "__offcnt")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            PREFIX_COL,
            F.when(
                F.col("__local_cnt") + F.col("__offcnt") > 0,
                F.coalesce(F.col("__local_cum"), F.lit(0)) + F.col("__offset"),
            ),
        )
        .drop("__pid", "__local_cum", "__local_cnt", "__offset", "__offcnt")
    )
