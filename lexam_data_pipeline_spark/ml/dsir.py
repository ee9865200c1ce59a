"""DSIR-style data selection: hashed n-gram importance weighting of a
raw corpus toward a target domain (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling", arXiv:2302.03169 —
public method description only).

The method's scale trick, realized exactly: both the target and raw
distributions live in a FIXED 256-bucket hashed feature space, so the
"model" is a 256-row weight table — broadcast, never shuffled — and
scoring the whole corpus is one map-side join plus one per-document
aggregate.  Corpus size only affects the two bucket-count aggregates
(256 groups, fully map-side combinable).

Deviation from the paper, for cross-engine exactness: bucket weights
are *scaled probability ratios* ``round(1e6 · (p_target/p_raw))``
rather than log-ratios — ``log`` is libm and not bit-portable, while
the ratio form is integer counts + one IEEE division chain written
with identical association on both engines (same tactic as the
BM25 integer-scaled idf, :mod:`ml.retrieval`).  Document scores are
then BIGINT sums — exact and order-independent — which is what makes
this key fully DuckDB-oracle-checked instead of rows-only.

Hashing is ``substr(md5(word), 1, 2)`` → 256 buckets: md5 is md5 in
every engine (same portability argument as :mod:`ml.curation`'s
hash-threshold sampling).  At a real 100 TB run you'd widen to the
paper's 10⁴ buckets (substr 1,4 → 65536) — the plan shape is
unchanged; the broadcast table stays tiny.

Fixture realization: target domain = ``lang = 'en'`` documents; the
selection is the top-k raw documents by importance score — the actual
DSIR resampling step with deterministic top-k in place of Gumbel noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table

#: Number of hex chars of md5 used as the bucket id (2 → 256 buckets).
BUCKET_HEX = 2

#: Target-domain predicate column value on the fixture corpus.
TARGET_LANG = "en"

#: Selection size of the resampling step.
TOP_K = 20


def _bucketed_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, b): one row per token, b = md5 bucket label."""
    ws = F.array_remove(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), ""
    )
    return docs.select(
        "doc_id", "lang", F.explode(ws).alias("w")
    ).select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("w")), 1, BUCKET_HEX).alias("b"),
    )


def bucket_weights(toks: DataFrame, target_lang: str = TARGET_LANG) -> DataFrame:
    """256-row (b, wgt) importance table: round(1e6·(p_target/p_raw))
    as BIGINT.  Buckets absent from the target get weight 0; buckets
    absent from raw don't exist by construction (raw ⊇ target)."""
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("n_r"))
    tgt = (
        toks.where(F.col("lang") == target_lang)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("t_r"),
        F.sum(
            (F.col("lang") == target_lang).cast("bigint")
        ).alias("t_t"),
    )
    joined = raw.join(tgt, "b", "left").join(F.broadcast(totals))
    # nullif guards: a corpus with no target-language (or no) tokens
    # yields null weights instead of an ANSI divide-by-zero; on real
    # corpora the totals are nonzero so the division chain is unchanged
    p_t = F.coalesce(F.col("n_t"), F.lit(0)).cast("double") / F.nullif(
        F.col("t_t").cast("double"), F.lit(0.0)
    )
    p_r = F.col("n_r").cast("double") / F.nullif(
        F.col("t_r").cast("double"), F.lit(0.0)
    )
    return joined.select(
        "b",
        F.round(F.lit(1e6) * (p_t / p_r)).cast("bigint").alias("wgt"),
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection over the document corpus: hashed-unigram
    importance weights toward the ``en`` target domain, BIGINT document
    scores, deterministic top-20 (score desc, doc_id asc).

    Oracle-checked: md5 bucketing, integer counts, and one identically
    associated IEEE division chain are reproduced verbatim in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _bucketed_tokens(docs)
    weights = bucket_weights(toks, TARGET_LANG)
    scored = (
        toks.join(F.broadcast(weights), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("wgt").alias("score"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(TOP_K)
