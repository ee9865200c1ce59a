"""Structured Streaming tests (SURVEY §7.7).

Correctness model: Structured Streaming is an incrementalized batch query,
so each streaming builder must produce EXACTLY its batch twin's result
when fed the same rows — asserted here over multi-file micro-batched
input.  Late-data handling is asserted separately with a watermark
append-mode run.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.plans.fixture_queries import (
    q_events_sliding,
    q_events_tumbling,
    q_session_window,
)
from lexam_data_pipeline_spark.streaming import (
    StreamProgressTracker,
    read_events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def _write_event_chunks(spark, sf_dir: str, out_dir: str, n_chunks: int = 3) -> None:
    """Split the fixture events into n ordered parquet files (micro-batch
    per file)."""
    pdf = load_table(spark, sf_dir, "events").orderBy("ts").toPandas()
    # micros, not nanos: the stream schema declares TimestampType and the
    # parquet writer must not fall back to INT64 nanos
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    os.makedirs(out_dir, exist_ok=True)
    size = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = pdf.iloc[i * size : (i + 1) * size]
        table = pa.Table.from_pandas(chunk, preserve_index=False)
        pq.write_table(table, os.path.join(out_dir, f"chunk_{i:03d}.parquet"))


def _rows(df) -> set:
    return {tuple(str(v) for v in r) for r in df.collect()}


@pytest.fixture(scope="module")
def chunk_dir(spark, sf_small, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("events_stream"))
    _write_event_chunks(spark, sf_small, d)
    return d


@pytest.mark.parametrize(
    "builder,batch_query,name",
    [
        (tumbling_counts, q_events_tumbling, "t_tumbling"),
        (sliding_counts, q_events_sliding, "t_sliding"),
        (session_counts, q_session_window, "t_session"),
    ],
)
def test_stream_equals_batch(spark, sf_small, chunk_dir, builder, batch_query, name):
    stream = read_events_stream(spark, chunk_dir, max_files_per_trigger=1)
    handle = run_stream_to_memory(builder(stream, watermark=None), name, output_mode="complete")
    try:
        got = _rows(handle.table(spark))
    finally:
        handle.stop()
    expected = _rows(batch_query(spark, sf_small))
    assert got == expected


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode + 2 h watermark: a row arriving after its window
    expired must not change the emitted count."""
    d = str(tmp_path / "late_events")
    os.makedirs(d)

    def write(name: str, rows: list[tuple[int, str, int, str, float, str]]):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name))

    # batch 1: two rows in the 10:00 window; one row far ahead pushes the
    # watermark to 13:30 - 2 h = 11:30 > 11:00 → window finalizes
    write(
        "b0.parquet",
        [
            (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 13:30:00", 1, "click", 1.0, "{}"),
        ],
    )
    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    handle = run_stream_to_memory(tumbling_counts(stream), "t_late", output_mode="append")
    try:
        # batch 2: a LATE row for the already-finalized 10:00 window plus
        # a fresh row advancing time further
        write(
            "b1.parquet",
            [
                (4, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),
                (5, "2024-01-01 14:30:00", 1, "click", 1.0, "{}"),
            ],
        )
        handle.process_new_input()
        # one more batch so pending emissions flush
        write("b2.parquet", [(6, "2024-01-01 17:00:00", 1, "click", 1.0, "{}")])
        handle.process_new_input()
        got = {
            (str(r["hour_ts"]), r["n_events"]) for r in handle.table(spark).collect()
        }
    finally:
        handle.stop()
    # the 10:00 window emitted exactly once with the 2 on-time rows; the
    # late row (event 4) was dropped by the watermark
    assert ("2024-01-01 10:00:00", 2) in got
    assert ("2024-01-01 10:00:00", 3) not in got


def test_progress_tracker(spark, chunk_dir):
    tracker = StreamProgressTracker()
    spark.streams.addListener(tracker)
    try:
        stream = read_events_stream(spark, chunk_dir, max_files_per_trigger=1)
        handle = run_stream_to_memory(
            tumbling_counts(stream, watermark=None), "t_progress", output_mode="complete"
        )
        handle.stop()
        # listener events are delivered asynchronously
        import time

        deadline = time.time() + 20
        while time.time() < deadline and sum(b["rows"] for b in tracker.batches) < 1000:
            time.sleep(0.25)
        total_rows = sum(b["rows"] for b in tracker.batches)
        assert total_rows == 1000  # sf0.001 events fixture size
        assert len(tracker.batches) >= 3  # one per chunk file
        snap = tracker.snapshot()
        assert snap.completed == total_rows
        assert snap.rate > 0
    finally:
        spark.streams.removeListener(tracker)


def test_streaming_generation_idempotent(spark, tmp_path):
    """ST3 under streaming re-delivery: variant files stream in (with an
    overlapping duplicate), the LLM runs per micro-batch, and the
    idempotent sink holds exactly one answer row per (variant, run)."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from lexam_data_pipeline_spark.pipeline.experiment import ExperimentStore
    from lexam_data_pipeline_spark.streaming.generation import (
        read_variants_stream,
        start_streaming_generation,
    )
    from tests.lexam_data import VARIANTS, lexam_tables
    from tests.test_pipeline import EXPERIMENT, MOCK_MCQ

    t = lexam_tables(spark)
    vdir = str(tmp_path / "variant_stream")
    os.makedirs(vdir)
    pdf = t["variants"].toPandas()
    # pandas widens nullable ints to float64; restore the declared type
    pdf["gold"] = pdf["gold"].astype("Int32")
    # file 1: variants 1-6; file 2: variants 5-10 (5 and 6 re-delivered)
    for name, part in (("f0.parquet", pdf.iloc[:6]), ("f1.parquet", pdf.iloc[4:])):
        pq2.write_table(pa.Table.from_pandas(part, preserve_index=False),
                        os.path.join(vdir, name))

    store = ExperimentStore(spark, str(tmp_path / "stream_store"))
    stream = read_variants_stream(spark, vdir, max_files_per_trigger=1)
    q = start_streaming_generation(
        stream, t["questions"], EXPERIMENT, store, client_spec=MOCK_MCQ
    )
    q.awaitTermination(120)
    answers = store.answers()
    # 10 distinct variants × n_answers=2, despite 12 streamed variant rows
    assert answers.count() == len(VARIANTS) * EXPERIMENT["n_answers"]
    assert answers.select("variant_id", "run_index").distinct().count() == 20


def test_session_window_boundary_semantics(spark):
    """Pin Spark's session merge rule: gap == duration MERGES (touching
    windows), gap > duration splits — the oracle's gaps-and-islands SQL
    must use strict '>'."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:30:00"),        # exactly 30 min → same session
            (1, "2024-01-01 11:00:00.000001"),  # 30 min + 1 µs → new session
        ],
        "user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .count()
        .select("s.start", "count")
        .orderBy("start")
        .collect()
    )
    assert [(str(r["start"]), r["count"]) for r in out] == [
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 11:00:00.000001", 1),
    ]


def test_stateful_user_tracker_accumulates(spark, tmp_path):
    """applyInPandasWithState: per-user totals must accumulate ACROSS
    micro-batches (state survives batch boundaries)."""
    from lexam_data_pipeline_spark.streaming import read_events_stream
    from lexam_data_pipeline_spark.streaming.stateful import user_activity_tracker

    d = str(tmp_path / "stateful_events")
    os.makedirs(d)

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name))

    write("b0.parquet", [
        (1, "2024-01-01 10:00:00", 1, "click", 2.0, "{}"),
        (2, "2024-01-01 10:05:00", 1, "click", 3.0, "{}"),
        (3, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
    ])
    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    # evict_idle=False: with the processing-time timeout armed,
    # processAllAvailable() never returns (timeout-check batches keep the
    # query busy) — drain-and-assert tests need NoTimeout
    q = (
        user_activity_tracker(stream, evict_idle=False)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .start()
    )
    try:
        q.processAllAvailable()
        write("b1.parquet", [
            (4, "2024-01-01 10:30:00", 1, "click", 5.0, "{}"),
        ])
        q.processAllAvailable()
        rows = spark.table("t_stateful").collect()
    finally:
        q.stop()
    # user 1: batch-1 update (2 events, 5.0) then batch-2 update with
    # state carried over (3 events, 10.0, span 30 min)
    u1 = sorted(
        [(r["n_events"], r["total_value"], r["span_seconds"]) for r in rows if r["user_id"] == 1]
    )
    assert u1 == [(2, 5.0, 300.0), (3, 10.0, 1800.0)]
    u2 = [(r["n_events"], r["total_value"]) for r in rows if r["user_id"] == 2]
    assert u2 == [(1, 1.0)]


def test_streaming_judging_idempotent(spark, tmp_path):
    """Judging as a stream over the answers sink: generation writes the
    sink, the judging stream drains it, and a full re-run of the stream
    (fresh checkpoint, same files) adds zero duplicate judgments."""
    from lexam_data_pipeline_spark.model import ANSWERS_SCHEMA
    from lexam_data_pipeline_spark.pipeline.experiment import ExperimentStore
    from lexam_data_pipeline_spark.pipeline.generation import run_generation
    from lexam_data_pipeline_spark.streaming.generation import start_streaming_judging
    from tests.lexam_data import lexam_tables
    from tests.test_pipeline import EXPERIMENT, MOCK_JUDGE, MOCK_MCQ

    t = lexam_tables(spark)
    store = ExperimentStore(spark, str(tmp_path / "judge_stream_store"))
    store.append_answers(
        run_generation(EXPERIMENT, t["variants"], t["questions"], client_spec=MOCK_MCQ)
    )
    answers_dir = str(tmp_path / "judge_stream_store" / "answers")

    def drain():
        stream = (
            spark.readStream.schema(ANSWERS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(answers_dir)
        )
        q = start_streaming_judging(
            stream, t["variants"], t["questions"], EXPERIMENT, "stream-judge",
            store, client_spec=MOCK_JUDGE,
        )
        q.awaitTermination(120)

    drain()
    # 4 open variants × n_answers=2 judged once each
    assert store.judgments().count() == 8
    drain()  # re-deliver everything: anti-join absorbs it
    assert store.judgments().count() == 8


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    """Exact streaming dedup: first-seen doc survives; duplicates within
    AND across micro-batches are suppressed by the hash state."""
    from lexam_data_pipeline_spark.streaming.dedup import (
        read_documents_stream,
        stream_dedup_exact,
    )

    d = str(tmp_path / "docs_stream")
    os.makedirs(d)

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name))

    write(
        "b0.parquet",
        [(1, "alpha body", "en", "s", 10), (2, "beta body", "en", "s", 9),
         (3, "alpha body", "en", "s", 10)],  # in-batch duplicate of 1
    )
    stream = read_documents_stream(spark, d, max_files_per_trigger=1)
    handle = run_stream_to_memory(
        stream_dedup_exact(stream), "t_dedup_stream", output_mode="append"
    )
    try:
        write(
            "b1.parquet",
            [(4, "alpha body", "en", "s", 10),   # cross-batch duplicate of 1
             (5, "gamma body", "en", "s", 10)],  # new
        )
        handle.process_new_input()
        rows = handle.table(spark).collect()
    finally:
        handle.stop()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    assert sorted(by_text) == ["alpha body", "beta body", "gamma body"]
    assert all(len(v) == 1 for v in by_text.values())  # one survivor each
    assert by_text["alpha body"] == [1]  # first-seen wins across batches


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the horizon are
    dropped; once the watermark passes a hash's event time, its state is
    evicted and a far-later duplicate is re-emitted (bounded state is the
    point — the batch tiers own far-apart duplicates)."""
    from lexam_data_pipeline_spark.streaming.dedup import (
        stream_dedup_exact_within_watermark,
    )
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    d = str(tmp_path / "docs_wm_stream")
    os.makedirs(d)
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("ingest_ts", TimestampType(), True),
            StructField("text", StringType(), True),
        ]
    )

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ingest_ts", "text"])
        pdf["ingest_ts"] = pd.to_datetime(pdf["ingest_ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name))

    write("b0.parquet", [(1, "2024-01-01 10:00:00", "dup body")])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    handle = run_stream_to_memory(
        stream_dedup_exact_within_watermark(stream, watermark="2 hours"),
        "t_dedup_wm",
        output_mode="append",
    )
    try:
        # within horizon: watermark still behind 10:00 → duplicate dropped
        write("b1.parquet", [(2, "2024-01-01 10:30:00", "dup body")])
        handle.process_new_input()
        # advance watermark far past 10:00 (14:00 - 2h = 12:00) → state evicted
        write("b2.parquet", [(3, "2024-01-01 14:00:00", "other body")])
        handle.process_new_input()
        # far-apart duplicate: state gone → re-emitted
        write("b3.parquet", [(4, "2024-01-01 14:30:00", "dup body")])
        handle.process_new_input()
        got = sorted(r["doc_id"] for r in handle.table(spark).collect())
    finally:
        handle.stop()
    assert got == [1, 3, 4]  # 2 deduped in-horizon; 4 re-emitted post-eviction


def test_stream_curate_corpus_matches_batch_policies(spark, tmp_path):
    """Streaming curation: the gate, redaction, and sampling behave
    exactly like the batch expressions; dedup is first-seen-wins."""
    from lexam_data_pipeline_spark.streaming.dedup import (
        read_documents_stream,
        stream_curate_corpus,
    )

    d = str(tmp_path / "docs_curate_stream")
    os.makedirs(d)
    body = "w " * 29 + "mail a@b.co"  # 31 words, one email

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name))

    write(
        "b0.parquet",
        [
            (1, body, "en", "s", 10),
            (2, "too short", "en", "s", 9),  # gate drops (2 words)
            (3, body, "en", "s", 10),  # in-batch duplicate of 1
        ],
    )
    stream = read_documents_stream(spark, d, max_files_per_trigger=1)
    handle = run_stream_to_memory(
        stream_curate_corpus(stream), "t_curate_stream", output_mode="append"
    )
    try:
        write("b1.parquet", [(4, body, "en", "s", 10),  # cross-batch duplicate
                             (5, body + " x", "en", "s", 10)])  # new content
        handle.process_new_input()
        rows = handle.table(spark).collect()
    finally:
        handle.stop()
    by_id = {r["doc_id"]: r for r in rows}
    assert sorted(by_id) == [1, 5]  # gate dropped 2; dedup dropped 3 and 4
    assert by_id[1]["n_words"] == 31
    assert by_id[1]["clean_text"].endswith("mail <EMAIL>")  # redacted output


def test_stream_decontamination_matches_batch(spark, tmp_path):
    """Streaming decontamination drops exactly the docs the batch
    operator flags, across micro-batches."""
    from lexam_data_pipeline_spark.streaming.dedup import (
        read_documents_stream,
        start_streaming_decontamination,
    )

    d = str(tmp_path / "docs_decontam_stream")
    os.makedirs(d)

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, name))

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    write("b0.parquet", [
        (1, "a quick brown fox jumps around", "en", "s", 10),   # hits 4-gram
        (2, "totally clean document body here", "en", "s", 10),
    ])
    write("b1.parquet", [
        (3, "over the lazy dog indeed", "en", "s", 10),          # hits
        (4, "another clean one entirely", "en", "s", 10),
    ])
    out: list[int] = []
    q = start_streaming_decontamination(
        read_documents_stream(spark, d, max_files_per_trigger=1),
        bench,
        lambda df: out.extend(r["doc_id"] for r in df.select("doc_id").collect()),
    )
    q.awaitTermination(120)
    assert sorted(out) == [2, 4]
