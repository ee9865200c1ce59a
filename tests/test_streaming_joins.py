"""Stream-stream attribution join must emit exactly the batch range
join's matches after draining a micro-batched split — including matches
whose two sides arrived in DIFFERENT micro-batches."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.streaming import read_events_stream
from lexam_data_pipeline_spark.streaming.joins import (
    attribution_join,
    start_attribution_stream,
)


def _batch_expected(spark, sf_dir: str) -> set:
    ev = load_table(spark, sf_dir, "events")
    joined = attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return {(r["user_id"], r["view_id"], r["purchase_id"]) for r in joined.collect()}


def test_drained_stream_join_equals_batch_join(spark, sf_small, tmp_path):
    # split along global ts order so view/purchase sides of one match
    # often land in different files (= different micro-batches)
    ev = load_table(spark, sf_small, "events")
    ranked = ev.withColumn("rk", F.row_number().over(Window.orderBy("ts", "event_id")))
    n = ranked.count()
    chunk_dir = str(tmp_path / "ev_chunks")
    per = (n + 3) // 4
    for i in range(4):
        ranked.filter(
            (F.col("rk") > i * per) & (F.col("rk") <= (i + 1) * per)
        ).drop("rk").coalesce(1).write.mode("append").parquet(chunk_dir)

    stream = read_events_stream(spark, chunk_dir, max_files_per_trigger=1)
    q = start_attribution_stream(stream, "attribution_out")
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attribution_out").collect()
    }
    expected = _batch_expected(spark, sf_small)
    assert expected, "fixture must produce at least one attribution match"
    assert got == expected


def test_attribution_window_semantics(spark):
    """Purchases exactly at the lag bound attribute; one tick past it
    don't; earlier purchases by OTHER users never cross wires."""
    import pandas as pd

    def mk(rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        return spark.createDataFrame(pdf)

    events = mk(
        [
            (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
            (2, "2024-01-01 12:00:00", 1, "purchase", 9.0, "{}"),  # == 2h bound
            (3, "2024-01-01 12:00:01", 1, "purchase", 8.0, "{}"),  # 1s past
            (4, "2024-01-01 10:30:00", 2, "purchase", 7.0, "{}"),  # other user
            (5, "2024-01-01 09:59:59", 1, "purchase", 6.0, "{}"),  # before view
        ]
    )
    got = {
        (r["view_id"], r["purchase_id"])
        for r in attribution_join(
            events.filter(F.col("event_type") == "view"),
            events.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == {(1, 2)}
