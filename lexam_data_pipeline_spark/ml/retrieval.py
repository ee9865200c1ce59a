"""Full-text retrieval over the ``documents`` fixture (north star):
BM25 ranking and hybrid lexical+vector search via reciprocal-rank fusion.

A training-data pipeline needs retrieval for curation (find near-topic
docs), contamination auditing (retrieve benchmark look-alikes), and RAG
eval-set construction.  The reference has only ILIKE substring search
(ref main.py:102-114); this module is the scale-out upgrade: an inverted
index + BM25 scoring, and RRF fusion with the embedding kNN ranking.

Engine-exactness: BM25 is pure rational arithmetic (the classic ``ln``
idf is swapped for the raw odds ratio ``(N-df+0.5)/(df+0.5)`` — libm
``ln`` may differ in the last ulp across engines).  Every per-term score
is a deterministic double (fixed operation order over exact integers),
then **floor-scaled to int64** before summation, so aggregation order
cannot perturb the total.  The DuckDB oracle replicates the formula
symbol-for-symbol; constants are injected from the same Python floats.

100 TB notes: the term index is ``explode → filter isin(query terms)``
— predicate pushdown keeps only candidate postings, so the shuffle
carries one row per (matching doc × query term), not the corpus.  The
df table is |query| rows → broadcast.  Corpus stats (N, avgdl) are one
map-side-combined aggregate → broadcast.  Final top-k compiles to
``TakeOrderedAndProject`` (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.functions.text import tokens

#: Query terms: one rare ('dup', df≈5% of docs) + two common — exercises
#: the idf spread.  A real engine takes these per query; fixture queries
#: pin them for oracle parity.
QUERY_TERMS: tuple[str, ...] = ("dup", "vector", "merge")

K1 = 1.2
B = 0.75
#: Precomputed in Python and injected into BOTH engines (computing
#: ``k1 + 1`` inside either engine could round differently than the
#: literal ``2.2``).
K1_PLUS_1 = K1 + 1.0
#: Integer scale for order-independent summation of per-term scores.
SCORE_SCALE = 1_000_000
#: Standard RRF dampening constant (Cormack et al.).
RRF_K = 60


def doc_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Index rows for ``docs``: one ``(doc_id, dl, term, tf)`` per
    distinct term per document — the unit the streaming index maintainer
    folds in per micro-batch (streaming/retrieval.py)."""
    base = docs.select("doc_id", tokens(text_col).alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("bigint").alias("dl")
    )
    return (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row ``(n_docs, total_dl)`` — mergeable by summation."""
    return docs.select(
        F.size(tokens(text_col)).cast("bigint").alias("dl")
    ).agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl"))


def score_postings(
    postings: DataFrame, stats: DataFrame, terms: tuple[str, ...]
) -> DataFrame:
    """BM25 over pre-built index rows (``doc_id, dl, term, tf``) and a
    one-row ``(n_docs, total_dl)`` stats table — the production path: no
    corpus scan, only index lookups.  Same return shape as
    :func:`bm25_scores` (which verifies this formula against the DuckDB
    oracle from raw text)."""
    if not terms:
        raise ValueError("score_postings requires at least one query term")
    cand = postings.filter(F.col("term").isin(*terms))
    df_tbl = cand.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avg = stats.select(
        "n_docs", (F.col("total_dl") / F.col("n_docs")).alias("avgdl")
    )
    scored = cand.join(F.broadcast(df_tbl), "term").crossJoin(F.broadcast(avg))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_part = (F.col("tf") * F.lit(K1_PLUS_1)) / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * (F.col("dl") / F.col("avgdl")))
    )
    term_scaled = F.floor(idf * tf_part * F.lit(float(SCORE_SCALE))).cast("bigint")
    return scored.select("doc_id", "term", term_scaled.alias("s")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.sum("s").cast("bigint").alias("score_scaled"),
    )


def bm25_scores(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """Per-document scaled-integer BM25 score for ``terms``.

    Returns ``doc_id, n_terms, score_scaled`` where ``score_scaled`` is
    ``sum(floor(per_term_bm25 * SCORE_SCALE))`` — exact under any
    aggregation order.

    Builds candidate postings + corpus stats inline and delegates the
    scoring formula to :func:`score_postings` (one implementation, two
    paths: this raw-corpus one the oracle verifies, and the maintained-
    index one streaming/retrieval.py serves).  The explode is filtered
    to the query's terms BEFORE the aggregate, so downstream carries one
    row per (candidate doc × query term); the df branch re-derives that
    subplan — measured cheaper than a persist barrier at fixture scale
    (0.7 s vs 1.5 s, the repo-wide "caching is not free" result).  At
    100 TB neither shape applies: df/N/avgdl come from the write-time
    index stats table, not a per-query corpus pass.
    """
    if not terms:
        raise ValueError("bm25_scores requires at least one query term")
    base = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("bigint").alias("dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    postings = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return score_postings(postings, stats, terms)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 for the pinned query terms.

    Deterministic tiebreak on doc_id; the reported ``bm25`` double is the
    exact integer ``score_scaled / SCORE_SCALE`` so hash-match holds.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, QUERY_TERMS)
        .orderBy(F.desc("score_scaled"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            "n_terms",
            "score_scaled",
            F.round(F.col("score_scaled") / F.lit(float(SCORE_SCALE)), 4).alias("bm25"),
        )
    )


def _rrf_points(rank_col: str) -> Column:
    """Scaled-integer RRF contribution ``1e9 div (RRF_K + rank)`` —
    integer division, so exact in every engine; missing rank → 0."""
    return F.coalesce(
        F.expr(f"div(1000000000, {RRF_K} + {rank_col})"), F.lit(0)
    ).cast("bigint")


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: fuse BM25 (lexical) and exact-cosine (vector)
    rankings with reciprocal-rank fusion; top-10 by fused score.

    The fixture ties ``documents.doc_id`` to ``embeddings.vec_id`` (both
    0-based synthetic ids).  Each side contributes its top-50 ranking;
    RRF points are integer (``1e9 div (60+rank)``), so the fused sum is
    order-independent and the DuckDB oracle verifies values exactly.

    100 TB: both branches end in TakeOrderedAndProject top-50 (tiny),
    fused with a broadcast-able full-outer join — the expensive parts are
    the branch scans, each already index/pruning-friendly.
    """
    from pyspark.sql import Window

    top = 50
    docs = load_table(spark, sf_dir, "documents")
    lex = (
        bm25_scores(docs, QUERY_TERMS)
        .orderBy(F.desc("score_scaled"), F.asc("doc_id"))
        .limit(top)
        .withColumn(
            "r_lex",
            F.row_number().over(
                Window.orderBy(F.desc("score_scaled"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_lex")
    )

    from lexam_data_pipeline_spark.ml.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    vec = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("vec_id", cosine(F.col("embedding"), F.col("q_emb")).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(top)
        .withColumn(
            "r_vec",
            F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id"))),
        )
        .select(F.col("vec_id").alias("doc_id"), "r_vec")
    )

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_vec",
        (_rrf_points("r_lex") + _rrf_points("r_vec")).alias("rrf_scaled"),
    )
    return (
        fused.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "r_lex", "r_vec", "rrf_scaled")
    )
