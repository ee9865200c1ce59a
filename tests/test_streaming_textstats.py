"""Streaming readability maintenance must be cell-identical to the
batch count table after draining any micro-batch split (integer counts
are exactly mergeable), and the Flesch report served off the drained
state must EQUAL q_readability's batch output row-for-row."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.plans.fixture_queries import q_readability
from lexam_data_pipeline_spark.streaming.textstats import (
    batch_counts,
    readability_merge,
    readability_report,
    start_streaming_readability,
)


class _Holder:
    def __init__(self, spark):
        self.spark, self.rows = spark, None
        self.schema = (
            "source string, n_docs long, words long, sentences long, "
            "syllables long"
        )

    def read(self) -> DataFrame | None:
        if self.rows is None:
            return None
        return self.spark.createDataFrame(self.rows, self.schema)

    def write(self, df: DataFrame) -> None:
        self.rows = df.collect()


def _cells(df) -> dict:
    return {
        r["source"]: (r["n_docs"], r["words"], r["sentences"], r["syllables"])
        for r in df.collect()
    }


def test_drained_state_equals_batch_counts(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    chunk_dir = str(tmp_path / "doc_chunks")
    for i in range(3):  # 3 files → 3 micro-batches under maxFilesPerTrigger=1
        docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(chunk_dir)
    holder = _Holder(spark)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    q = start_streaming_readability(stream, holder.read, holder.write)
    q.awaitTermination(120)
    assert _cells(holder.read()) == _cells(batch_counts(docs))


def test_merge_is_split_invariant(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    one = readability_merge(None, docs)
    state = None
    holder = _Holder(spark)
    for i in range(4):
        chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
        holder.write(readability_merge(state, chunk))
        state = holder.read()  # materialize between folds like a real sink
    assert _cells(state) == _cells(one)


def test_report_off_state_equals_batch_query(spark, sf_small):
    """End-to-end equality with the declared contract key: fold the
    corpus in 4 chunks, serve, and compare every column of every row
    against q_readability — bit-for-bit (same integer totals, same
    closing expression)."""
    docs = load_table(spark, sf_small, "documents")
    state = None
    holder = _Holder(spark)
    for i in range(4):
        holder.write(
            readability_merge(
                state, docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
            )
        )
        state = holder.read()
    served = [tuple(r) for r in readability_report(state).collect()]
    batch = [tuple(r) for r in q_readability(spark, sf_small).collect()]
    assert served == batch and served
