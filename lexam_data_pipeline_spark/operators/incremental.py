"""Incremental aggregate maintenance (materialized-view refresh).

The reference recomputes every dashboard aggregate from scratch per
request (``/root/reference/backend/app/main.py:339-441``).  At 100 TB a
daily-append corpus cannot re-aggregate history: the scalable shape is a
*partial-aggregate state table* — one row per group holding combinable
accumulators (count, decimal sums) — refreshed per batch by aggregating
ONLY the new rows and merging into the state with one full-outer join on
the group key (the same plan :mod:`operators.merge` uses).

Why decomposable accumulators and not finished values: count/sum/min/max
merge associatively, so the merged state is bit-identical to a from-
scratch aggregate regardless of how history was batched — averages and
ratios are derived at read time from the exact sums.  (Non-decomposable
aggregates — exact median, collect_set cardinality — need their own
state shapes: sketches or re-aggregation; documented per call site.)

``q_incremental_agg`` in :mod:`plans.fixture_queries` proves the
equivalence as an oracle-checked query: orders split into two arbitrary
"batches", aggregated independently, merged — versus the oracle's plain
GROUP BY over the full table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def partial_state(df: DataFrame, keys: Sequence[str], measure: str) -> DataFrame:
    """Aggregate a batch into combinable state: (keys, n, sum_dec).

    The measure is summed as ``decimal(18,2)`` so merges are exact and
    order-independent (see fixture_queries numeric-parity rules).
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(measure).cast("decimal(18,2)")).alias("sum_dec"),
    )


def merge_state(state: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge a batch's partial state into the running state.

    One full-outer join on the group key; accumulators add (null-safe).
    At scale the state table is bucketed by the key, so only the delta —
    proportional to the batch, not history — shuffles.
    """
    d = delta.select(
        [F.col(k).alias(f"__d_{k}") for k in keys]
        + [F.col("n").alias("__d_n"), F.col("sum_dec").alias("__d_sum")]
    )
    cond = [state[k].eqNullSafe(d[f"__d_{k}"]) for k in keys]
    joined = state.join(d, cond, "full_outer")
    return joined.select(
        [F.coalesce(state[k], d[f"__d_{k}"]).alias(k) for k in keys]
        + [
            (
                F.coalesce(state["n"], F.lit(0))
                + F.coalesce(d["__d_n"], F.lit(0))
            ).alias("n"),
            (
                F.coalesce(state["sum_dec"], F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(d["__d_sum"], F.lit(0).cast("decimal(18,2)"))
            ).alias("sum_dec"),
        ]
    )
