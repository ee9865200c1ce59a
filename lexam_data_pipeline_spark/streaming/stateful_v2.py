"""The same stateful operator on Spark 4's ``transformWithStateInPandas``.

:mod:`streaming.stateful` implements per-user running totals on
``applyInPandasWithState`` (the Spark 3.x-era API, one state tuple per
key, timeout enum).  Spark 4 replaced that with the StatefulProcessor
model — named state variables on a handle, explicit timers, init/close
lifecycle — which is where new stateful operators should land; both
implementations are kept because the semantics contract is the
interesting part and the test asserts they agree row-for-row on the
same input stream.

State design is identical: one value-state tuple per user (bounded by
user cardinality).  ``timeMode="None"`` here — eviction timers are the
v1 module's demonstrated concern, and drain-style tests need timer-free
queries (see the v1 caveat on ``processAllAvailable``).

Runtime requirements (import-gated in the test): the API's state
protocol needs ``google.protobuf`` (not a declared pyspark dependency)
and the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lexam_data_pipeline_spark.streaming.stateful import OUTPUT_SCHEMA, STATE_SCHEMA


def tws_available() -> bool:
    """Runtime capability probe for ``transformWithStateInPandas``.

    The API's driver↔worker state protocol is protobuf-based but pyspark
    does not declare the dependency, so absence surfaces as a deep
    worker-side stack mid-query.  Probe up front instead; callers (and
    the test suite) branch on this rather than env-gating.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_activity_tracker_v2(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas``.

    Emits the v1 schema (``final`` always False — no timers here).  The
    processor class is defined INSIDE the builder so cloudpickle ships
    it by value (same vanilla-session constraint as v1).

    Raises ``RuntimeError`` immediately when the runtime lacks the API's
    protobuf dependency (:func:`tws_available`) — a clear driver-side
    error beats the opaque executor stack the query would die with.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf, which this "
            "runtime does not provide; use streaming.stateful."
            "user_activity_tracker (applyInPandasWithState) — same semantics, "
            "test-pinned row-for-row"
        )
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Tracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._acc.exists():
                n, total, first_us, last_us = self._acc.get()
            else:
                n, total, first_us, last_us = 0, 0.0, None, None
            for pdf in rows:
                ts_us = pdf["ts"].astype("int64") // 1000
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                b_first, b_last = int(ts_us.min()), int(ts_us.max())
                first_us = b_first if first_us is None else min(first_us, b_first)
                last_us = b_last if last_us is None else max(last_us, b_last)
            self._acc.update((n, total, first_us, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "span_seconds": [(last_us - first_us) / 1e6],
                    "final": [False],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Tracker(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
