"""Incremental cross-source near-dup-rate maintenance must be
row-identical to the batch key after draining ANY micro-batch split —
including the df-cap RETRACTION path (a shingle crossing MAX_DF must
withdraw its past pair/n_sh contributions), which is the part a naive
append-only fold gets wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.dedup import q_dedup_rate_by_source
from lexam_data_pipeline_spark.streaming.dedup_rates import (
    MAX_DF,
    STATE_TABLES,
    _SCHEMAS,
    dedup_rates_merge,
    dedup_rates_report,
    start_streaming_dedup_rates,
)


class _Holder:
    """In-memory named-table state store (collect-materialized, like a
    real sink)."""

    def __init__(self, spark):
        self.spark, self.rows = spark, {}

    def read(self, name: str) -> DataFrame | None:
        if name not in self.rows:
            return None
        return self.spark.createDataFrame(self.rows[name], _SCHEMAS[name])

    def write(self, name: str, df: DataFrame) -> None:
        self.rows[name] = df.collect()

    def state(self) -> dict[str, DataFrame | None]:
        return {t: self.read(t) for t in STATE_TABLES}


def _rows(df: DataFrame) -> list:
    return sorted(tuple(r) for r in df.collect())


def _drain_chunks(spark, docs: DataFrame, k: int) -> _Holder:
    holder = _Holder(spark)
    for i in range(k):
        chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(k)) == i)
        new_state = dedup_rates_merge(holder.state(), chunk)
        for t in STATE_TABLES:
            holder.write(t, new_state[t])
    return holder


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.slowsuite
def test_drained_report_equals_batch_key(spark, sf_small, k):
    docs = load_table(spark, sf_small, "documents")
    holder = _drain_chunks(spark, docs, k)
    got = _rows(dedup_rates_report(holder.state()))
    want = _rows(q_dedup_rate_by_source(spark, sf_small))
    assert got == want


@pytest.mark.slowsuite
def test_split_order_invariance(spark, sf_small):
    """Reversed chunk order must converge to the same state cells —
    the fold is not merely append-order-lucky."""
    docs = load_table(spark, sf_small, "documents")
    holder = _Holder(spark)
    for i in (2, 0, 1):
        chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        new_state = dedup_rates_merge(holder.state(), chunk)
        for t in STATE_TABLES:
            holder.write(t, new_state[t])
    got = _rows(dedup_rates_report(holder.state()))
    want = _rows(q_dedup_rate_by_source(spark, sf_small))
    assert got == want


def test_retraction_path_fires(spark):
    """Synthetic corpus forcing a df-cap crossing ACROSS batches: a
    shared shingle sits under the cap after batch 1 (its pairs count),
    then batch 2 pushes it past MAX_DF — the drained report must match
    the batch computation on the union, i.e. the early pairs must have
    been withdrawn."""
    base = "alpha beta gamma"  # one 3-shingle per doc
    n1, n2 = MAX_DF - 10, 20  # 40 + 20 = 60 > MAX_DF
    rows1 = [(i, base, "en", "srcA", len(base)) for i in range(n1)]
    rows2 = [
        (n1 + i, base, "en", "srcB", len(base)) for i in range(n2)
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)
    holder = _Holder(spark)
    for t, df in dedup_rates_merge(holder.state(), b1).items():
        holder.write(t, df)
    # mid-stream: the shingle is under the cap, so batch-1 pairs exist
    n_mid = len(holder.rows["pairs"])
    assert n_mid == n1 * (n1 - 1) // 2, n_mid
    for t, df in dedup_rates_merge(holder.state(), b2).items():
        holder.write(t, df)
    report = dedup_rates_report(holder.state()).collect()
    assert report == [], f"crossed shingle must retract all pairs: {report}"
    # every doc's n_sh dropped back to 0 and postings are gone
    assert all(r["n_sh"] == 0 for r in holder.read("docs").collect())
    assert holder.rows["postings"] == []
    assert holder.rows["pairs"] == []


def test_streaming_drain_equals_batch_key(spark, sf_small, tmp_path):
    """End-to-end through foreachBatch: 3 files → 3 micro-batches under
    maxFilesPerTrigger=1; the served report equals the batch key."""
    docs = load_table(spark, sf_small, "documents")
    chunk_dir = str(tmp_path / "doc_chunks")
    for i in range(3):
        docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(chunk_dir)
    holder = _Holder(spark)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    q = start_streaming_dedup_rates(stream, holder.read, holder.write)
    q.awaitTermination(180)
    got = _rows(dedup_rates_report(holder.state()))
    want = _rows(q_dedup_rate_by_source(spark, sf_small))
    assert got == want
