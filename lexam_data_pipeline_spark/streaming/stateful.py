"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 ST2 as a *streaming-native* operator).

``user_activity_tracker`` maintains per-user running totals across
micro-batches — the stateful generalization of the reference's progress
store (progress.py:17-72): each update emits the user's lifetime event
count, value sum, and activity span so far.  This is the primitive for
operators the built-in windows can't express (running distinct-ish
counters, custom eviction, cross-batch accumulators).

State design: one row per user (bounded by user cardinality), explicit
processing-time timeout evicts idle users — the state store never grows
unboundedly.  ``GroupStateTimeout.ProcessingTimeTimeout`` + the timeout
flush emits a final tombstone row (``final=true``) per evicted user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("first_us", LongType(), True),
        StructField("last_us", LongType(), True),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("span_seconds", DoubleType(), True),
        StructField("final", BooleanType(), True),
    ]
)


def user_activity_tracker(events: DataFrame, *, evict_idle: bool = True) -> DataFrame:
    """Per-user running totals across micro-batches (update output mode).

    ``evict_idle`` arms the 1 h processing-time timeout (bounded state in
    production).  CAVEAT, pinned by test: with ProcessingTimeTimeout the
    engine schedules timeout-evaluation batches indefinitely, so
    ``processAllAvailable()`` NEVER RETURNS — drive timeout-armed queries
    by polling the sink.  Tests that need drain-and-stop semantics use
    ``evict_idle=False``.

    The state function is defined INSIDE this builder so cloudpickle
    serializes it by value — a module-level function pickles by reference
    to this package, which executor Python workers cannot import when the
    driver runs from outside the repo (the failure mode only reproduces
    under a vanilla session; see .claude/skills/verify)."""

    def track(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total, first_us, last_us = state.get
            state.remove()
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "span_seconds": [(last_us - first_us) / 1e6],
                    "final": [True],
                }
            )
            return

        n, total, first_us, last_us = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdf_iter:
            ts_us = pdf["ts"].astype("int64") // 1000  # datetime64[ns] → µs
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            batch_first, batch_last = int(ts_us.min()), int(ts_us.max())
            first_us = batch_first if first_us is None else min(first_us, batch_first)
            last_us = batch_last if last_us is None else max(last_us, batch_last)
        state.update((n, total, first_us, last_us))
        if evict:
            state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1 h idle
        yield _pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "span_seconds": [(last_us - first_us) / 1e6],
                "final": [False],
            }
        )

    evict = evict_idle
    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if evict_idle else GroupStateTimeout.NoTimeout
        ),
    )
