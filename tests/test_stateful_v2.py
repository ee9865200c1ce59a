"""transformWithStateInPandas twin must agree with the
applyInPandasWithState original on the same micro-batched input."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(d, name, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name)
    )


def _protobuf_available() -> bool:
    # transformWithState's driver↔worker state protocol is protobuf-based;
    # pyspark does not declare the dependency and this container lacks it.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (not in this env)",
)
def test_v2_matches_v1_across_batches(spark, tmp_path):
    from lexam_data_pipeline_spark.streaming import read_events_stream
    from lexam_data_pipeline_spark.streaming.stateful import user_activity_tracker
    from lexam_data_pipeline_spark.streaming.stateful_v2 import (
        user_activity_tracker_v2,
    )

    # transformWithState requires the RocksDB state store; restore the
    # session default afterwards so other streaming tests are untouched.
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    d = str(tmp_path / "events_v2")
    os.makedirs(d)
    _write(d, "b0.parquet", [
        (1, "2024-01-01 10:00:00", 1, "click", 2.0, "{}"),
        (2, "2024-01-01 10:05:00", 1, "click", 3.0, "{}"),
        (3, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
    ])
    _write(d, "b1.parquet", [
        (4, "2024-01-01 10:30:00", 1, "click", 5.0, "{}"),
        (5, "2024-01-01 11:00:00", 3, "view", 7.0, "{}"),
    ])

    def drain(builder, sink_name):
        stream = read_events_stream(spark, d, max_files_per_trigger=1)
        q = (
            builder(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(sink_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(
            (
                r["user_id"],
                r["n_events"],
                r["total_value"],
                r["span_seconds"],
                r["final"],
            )
            for r in spark.table(sink_name).collect()
        )

    try:
        v2 = drain(user_activity_tracker_v2, "t_v2")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    v1 = drain(lambda s: user_activity_tracker(s, evict_idle=False), "t_v1")
    assert v1 == v2
    # and the absolute values are right: user 1 accumulates across batches
    u1_final = [r for r in v2 if r[0] == 1][-1]
    assert u1_final[1:4] == (3, 10.0, 1800.0)
