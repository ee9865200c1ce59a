"""Streaming count-min sketch maintenance: fold each micro-batch's
sketch into a persistent (depth, bucket, c) state table.

This is the streaming face of :mod:`ml.cms` and the textbook argument
for sketches at 100 TB: CMS is MERGEABLE — the sketch of a union of
streams is the cell-wise sum of per-stream sketches (same hash family,
no approximation added by merging).  So the per-trigger work is one
map-side-combinable aggregate over the batch (output ≤ d·w rows) plus a
(d·w)-row state merge, regardless of stream volume or key cardinality;
after draining ANY split of the stream the state is COUNTER-IDENTICAL
to the batch-built sketch (tests/test_streaming_sketches.py proves
equality, not approximate agreement).

Heavy-hitter serving from the maintained state uses
:func:`ml.cms.cms_estimate` (d broadcast joins + least).  Estimates can
only over-count, so ``est ≥ T`` has no false negatives; the exact
confirm pass of :func:`ml.cms.heavy_hitters` needs the raw occurrence
table and therefore stays a batch/lakehouse job over candidates only.

State store contract matches the other foreachBatch maintainers
(streaming/retrieval.parquet_state_store: atomic versioned swap).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from lexam_data_pipeline_spark.ml.cms import DEFAULT_D, DEFAULT_W, cms_build

STATE_COLUMNS = ("depth", "bucket", "c")


def cms_merge(
    state: DataFrame | None,
    batch: DataFrame,
    key: Column,
    w: int = DEFAULT_W,
    d: int = DEFAULT_D,
) -> DataFrame:
    """Cell-wise sum of the prior sketch and the batch's sketch.

    ``state`` is a prior return value (or None); ``batch`` is raw
    occurrence rows.  Pure batch logic — the streaming loop just calls
    it per trigger."""
    fresh = cms_build(batch, key, w, d)
    if state is None:
        return fresh.select(*STATE_COLUMNS)
    return (
        state.select(*STATE_COLUMNS)
        .unionByName(fresh)
        .groupBy("depth", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def start_streaming_cms(
    stream: DataFrame,
    key: Column,
    read_state: Callable[[], DataFrame | None],
    write_state: Callable[[DataFrame], None],
    *,
    w: int = DEFAULT_W,
    d: int = DEFAULT_D,
    available_now: bool = True,
):
    """Maintain a CMS frequency sketch under a micro-batched occurrence
    stream.  Same lazy-read callback contract as the other maintainers:
    use ``parquet_state_store`` (atomic versioned swap) or a
    materializing holder.  Returns the StreamingQuery."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        write_state(cms_merge(read_state(), batch, key, w, d))

    writer = stream.writeStream.foreachBatch(process_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
