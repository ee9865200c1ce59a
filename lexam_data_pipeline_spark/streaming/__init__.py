"""Structured Streaming layer (SURVEY §7.7): streaming twins of the
windowed batch queries + progress telemetry."""

from lexam_data_pipeline_spark.streaming.events import (
    EVENTS_SCHEMA,
    StreamingQueryHandle,
    read_events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from lexam_data_pipeline_spark.streaming.stateful import user_activity_tracker
from lexam_data_pipeline_spark.streaming.progress import (
    ProgressSnapshot,
    StreamProgressTracker,
)

__all__ = [
    "EVENTS_SCHEMA",
    "ProgressSnapshot",
    "StreamProgressTracker",
    "StreamingQueryHandle",
    "read_events_stream",
    "run_stream_to_memory",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
    "user_activity_tracker",
]
