"""Benchmark decontamination: flag training documents that share any
word n-gram with a held-out benchmark/eval set.

This is the standard pretraining-hygiene operator (GPT-3 appendix C /
Llama-style 13-gram overlap, here parameterized): build the benchmark's
distinct n-gram set once, then scan the corpus for membership.

100 TB shape: benchmark sets are tiny relative to the corpus (eval
suites are thousands of documents, the corpus is billions), so the
benchmark gram set — deduped to ``(gram, bench_doc)`` pairs — is
BROADCAST and the corpus-side scan is a map-side join: no shuffle of
corpus shingles ever happens.  The only shuffle is the final per-doc
contamination rollup, which carries hit grams only (a vanishing
fraction of the corpus).  Shingling itself is pure whole-stage-codegen
column expressions (functions.text.shingle_set) — no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.functions.text import shingle_set, tokens


def _doc_grams(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """One row per (doc, distinct word n-gram); short docs clamp to a
    single whole-text shingle (same clamp as the DuckDB oracle)."""
    return (
        docs.withColumn("__toks", tokens(text_col))
        .withColumn("gram", F.explode(shingle_set(F.col("__toks"), n)))
        .drop("__toks")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per contaminated corpus doc: how many distinct n-grams it shares
    with the benchmark (``n_hit_grams``) and how many distinct benchmark
    docs it collides with (``n_bench_docs``).  Clean docs are absent —
    the caller anti-joins this result to drop contamination.
    """
    bench_grams = F.broadcast(
        _doc_grams(benchmark.select(F.col(id_col).alias("bench_id"), text_col), text_col, n)
        .select("bench_id", "gram")
        .distinct()
    )
    corpus_grams = _doc_grams(corpus.select(id_col, text_col), text_col, n).select(
        id_col, "gram"
    )
    return (
        corpus_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep over the fixture corpus with a synthetic
    held-out set (every 10th doc) and 4-gram overlap — dense enough
    that the fixture's planted near-duplicates collide (~15% of the
    corpus flags at sf0.01)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return decontaminate(corpus, bench, n=4)
