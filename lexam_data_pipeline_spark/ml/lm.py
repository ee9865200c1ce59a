"""In-engine n-gram language model for perplexity-style quality
filtering — the classic pretraining-corpus gate (CCNet/KenLM shape):
train a bigram model ON the corpus, score every document's average
per-token surprisal, flag the outliers.

Unlike :func:`ml.tokenizer.train_bpe` (whose vocabulary collect must
be capped), the model here NEVER lands on the driver: bigram and
history counts are window aggregates carried alongside the exploded
bigram rows, and scoring is a per-document sum — model size is
O(distinct bigrams) but stays distributed end to end.

Scale posture:

* Three shuffles total: window count over (w1,w2), window count over
  w1, and the per-document regroup — each map-side combinable keyed on
  bigram/token/doc ids, never a row-level self-join.
* The vocabulary size (smoothing denominator) is one
  ``approx``-free exact distinct aggregate broadcast as a 1-row
  crossJoin.
* At 100 TB the (w1,w2) window inherits the same skew posture as the
  dedup gram index: a stopword-pair hot key is bounded by the window
  being a COUNT (partial aggregation), not a materialized group.

Float caveat: ``log2`` surprisal sums are float and partition-order
dependent → :func:`q_lm_surprisal` is declared ROWS-ONLY;
``tests/test_lm.py`` is the oracle (an independent pure-Python bigram
model on the collected corpus must agree on per-language averages to
1e-9 relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from lexam_data_pipeline_spark.catalog import load_table

#: Flagging threshold, bits per token.  A fixed literal (not a corpus
#: statistic) so the featurizer needs no extra pass.
SURPRISAL_BITS_FLAG = 9.0


def doc_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, n_bigrams, bits): average add-one-smoothed bigram
    surprisal −log₂ P(w₂|w₁) per document.  Documents with fewer than
    two tokens carry no bigram evidence and are excluded up front."""
    ws = F.array_remove(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), "")
    toks = docs.select("doc_id", "lang", ws.alias("ws")).where(
        F.size("ws") >= 2
    )
    pairs = F.expr(
        "transform(slice(ws, 1, size(ws) - 1),"
        " (w, i) -> struct(w AS w1, ws[i + 1] AS w2))"
    )
    bg = toks.select(
        "doc_id", "lang", F.explode(pairs).alias("p")
    ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    vocab = (
        toks.select(F.explode("ws").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    c12 = F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
    c1 = F.count(F.lit(1)).over(Window.partitionBy("w1"))
    scored = bg.withColumn("c12", c12).withColumn("c1", c1).join(
        F.broadcast(vocab)
    )
    bits = -F.log2(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    return (
        scored.select("doc_id", "lang", bits.alias("bits"))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("bits") / F.count(F.lit(1))).alias("bits"),
        )
    )


def q_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus quality report from the in-engine bigram LM:
    document count, mean bits/token, and how many documents the
    ``SURPRISAL_BITS_FLAG`` gate would drop.

    Rows-only by declared design (float log sums);
    tests/test_lm.py verifies against an independent pure-Python
    bigram model."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = doc_surprisal(docs)
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("bits"), 6).alias("avg_bits"),
            F.sum(
                (F.col("bits") > F.lit(SURPRISAL_BITS_FLAG)).cast("bigint")
            ).alias("n_flagged"),
        )
        .orderBy("lang")
    )
