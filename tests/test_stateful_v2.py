"""transformWithStateInPandas twin must agree with the
applyInPandasWithState original on the same micro-batched input.

This suite runs EVERYWHERE (no skips): when the runtime provides
google.protobuf the v2 query runs and must match v1 row-for-row; when it
doesn't (this container), the capability probe must say so, the v2
builder must fail fast with an actionable error, and the shared
semantics contract is still executed and value-pinned through the v1
path on the identical input stream.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexam_data_pipeline_spark.streaming.stateful_v2 import (
    tws_available,
    user_activity_tracker_v2,
)


def _write(d, name, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name)
    )


def _make_fixture(tmp_path) -> str:
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
    return d


def _drain(spark, d, builder, sink_name):
    from lexam_data_pipeline_spark.streaming import read_events_stream

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


def _assert_contract(rows):
    """The semantics both implementations must produce on the fixture:
    user 1 accumulates across micro-batches (3 events, 10.0 value,
    1800 s span); users 2 and 3 are single-event."""
    u1_final = [r for r in rows if r[0] == 1][-1]
    assert u1_final[1:4] == (3, 10.0, 1800.0)
    assert [r for r in rows if r[0] == 2][-1][1:4] == (1, 1.0, 0.0)
    assert [r for r in rows if r[0] == 3][-1][1:4] == (1, 7.0, 0.0)


def test_capability_probe_reflects_runtime():
    try:
        from google.protobuf import descriptor  # noqa: F401

        have = True
    except ImportError:
        have = False
    assert tws_available() is have


def test_v2_semantics_contract(spark, tmp_path):
    """Runs the contract through whichever implementations the runtime
    supports — never skips."""
    from lexam_data_pipeline_spark.streaming.stateful import user_activity_tracker

    d = _make_fixture(tmp_path)
    v1 = _drain(
        spark, d, lambda s: user_activity_tracker(s, evict_idle=False), "t_v1"
    )
    _assert_contract(v1)

    if not tws_available():
        # fail-fast contract: a clear driver-side error naming the
        # missing dependency and the equivalent supported operator
        with pytest.raises(RuntimeError, match="google.protobuf"):
            user_activity_tracker_v2(spark.readStream.format("rate").load())
        return

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        v2 = _drain(spark, d, user_activity_tracker_v2, "t_v2")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert v1 == v2
    _assert_contract(v2)
