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
from lexam_data_pipeline_spark.streaming.dedup import (
    DOCUMENTS_SCHEMA,
    read_documents_stream,
    stream_dedup_exact,
    stream_dedup_exact_within_watermark,
)
from lexam_data_pipeline_spark.streaming.incremental import start_streaming_aggregate
from lexam_data_pipeline_spark.streaming.scd2 import scd2_merge, start_streaming_scd2
from lexam_data_pipeline_spark.streaming.sketches import cms_merge, start_streaming_cms
from lexam_data_pipeline_spark.streaming.joins import attribution_join, start_attribution_stream
from lexam_data_pipeline_spark.streaming.ivm import join_view_delta, start_streaming_join_view
from lexam_data_pipeline_spark.streaming.stateful import user_activity_tracker
from lexam_data_pipeline_spark.streaming.progress import (
    ProgressSnapshot,
    StreamProgressTracker,
)

__all__ = [
    "DOCUMENTS_SCHEMA",
    "EVENTS_SCHEMA",
    "read_documents_stream",
    "stream_dedup_exact",
    "stream_dedup_exact_within_watermark",
    "ProgressSnapshot",
    "StreamProgressTracker",
    "StreamingQueryHandle",
    "read_events_stream",
    "run_stream_to_memory",
    "session_counts",
    "sliding_counts",
    "attribution_join",
    "cms_merge",
    "join_view_delta",
    "scd2_merge",
    "start_streaming_aggregate",
    "start_attribution_stream",
    "start_streaming_cms",
    "start_streaming_join_view",
    "start_streaming_scd2",
    "tumbling_counts",
    "user_activity_tracker",
]
