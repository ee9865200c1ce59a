"""Text-analysis operators: quality scoring, token counting, language ID,
fingerprinting (north star).

All expression-level except nothing — no UDFs at all; at 100 TB these run
entirely inside whole-stage codegen over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.functions.text import (
    avg_word_len,
    min_fingerprint,
    stopword_ratio,
    tokens,
    word_count,
)

STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
#: Same regex class semantics in Java (Spark) and RE2 (DuckDB).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language marker vocabularies for heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: word count, mean word length,
    stopword ratio.  All ratios divide exact integers → engine-exact."""
    docs = load_table(spark, sf_dir, "documents", fan=True)
    # materialize tokens once: inline token exprs re-evaluate per lambda
    # element inside higher-order functions (see functions.text.shingles)
    toks = F.col("toks")
    return docs.select("doc_id", "text", tokens("text").alias("toks")).select(
        "doc_id",
        word_count("text").cast("int").alias("n_words"),  # \S+ runs
        F.round(avg_word_len(toks), 4).alias("avg_word_len"),
        F.round(stopword_ratio(toks, STOPWORDS), 4).alias("stopword_ratio"),
    )


def q_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting aggregated per language (cost estimation for
    LLM corpus curation)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.regexp_count(F.col("text"), F.lit(TOKEN_REGEX))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shingle fingerprint per document (1-perm MinHash over
    md5 — portable to any engine with md5)."""
    docs = load_table(spark, sf_dir, "documents", fan=True)
    return docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", min_fingerprint(F.col("toks")).alias("fingerprint")
    )


def lang_scores(toks_col: F.Column) -> dict[str, F.Column]:
    """Per-language marker-vote scores over a lowercased token array."""

    def marker_score(markers: tuple[str, ...]):
        # closure factory: a default-arg lambda would read as a 2-arg
        # (element, index) lambda to Spark's lambda binder
        return F.size(F.filter(toks_col, lambda t: t.isin(*markers)))

    return {lang: marker_score(m) for lang, m in LANG_MARKERS.items()}


def predict_lang(scores: dict[str, F.Column]) -> F.Column:
    """Winning language with declaration-order tie-break; 'unknown' when
    no marker hits.  Shared by :func:`q_lang_id` and the declarative
    pipeline's ``lang_filter`` stage."""
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang, sc in scores.items():
        pred = pred.when(sc == best, F.lit(lang))
    return pred


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-vocabulary voting over tokens, with
    'unknown' fallback.  Oracle-checked: the DuckDB twin replicates the
    marker sets and the declaration-order tie-break exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.transform(tokens("text"), F.lower).alias("toks")
    )
    scores = lang_scores(F.col("toks"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[sc.alias(f"score_{lang}") for lang, sc in scores.items()],
    )
    return scored.select(
        "doc_id",
        "lang",
        predict_lang({lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}).alias(
            "predicted_lang"
        ),
    )


def rolling_hash(
    toks: F.Column,
    base: int = 131,
    mod: int = (1 << 31) - 1,
    portable: bool = True,
) -> F.Column:
    """Rabin–Karp polynomial rolling hash over a token array:
    ``h = fold(acc * B + hash(tok) mod M)`` — one codegen'd pass, order-
    sensitive (unlike the min-fingerprint, token order changes the value).

    ANSI-overflow-safe: acc < 2^31 and B = 131 keep ``acc*B + h`` under
    2^39 in int64.  ``portable=True`` (default) seeds each token with
    the first 8 md5 hex digits as an integer — reproducible on ANY
    engine with md5, which is what upgraded ``q_doc_rolling_hash`` from
    rows-only to a full DuckDB hash-match oracle in round 10.
    ``portable=False`` keeps the xxhash64 seed (one JVM hash instead of
    md5+conv — the marginally cheaper, Spark-only production variant).
    """
    if portable:
        return F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: F.pmod(
                acc * base
                + F.pmod(
                    F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
                    F.lit(mod),
                ),
                F.lit(mod),
            ),
        )
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * base + F.pmod(F.xxhash64(t), F.lit(mod)), F.lit(mod)),
    )


def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (north star: fast
    change-detection / exact-dedup key that streams in one pass) —
    md5-seeded portable form, hash-match-oracled against the DuckDB
    ``list_reduce`` twin (round 10; previously rows-only via xxhash64)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", rolling_hash(F.col("toks")).alias("rhash")
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style term weighting (north star: text analysis): top-3
    terms per document by df-normalized weight.

    Weight = tf / df as an integer-division double — engine-exact, unlike
    ``tf·ln(N/df)`` whose libm ``ln`` can differ in the last ulp between
    engines (the log variant is a one-line switch for production).  One
    shuffle for df (window over term), one for the per-doc top-k window;
    ties broken by term text for determinism.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    terms = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    with_df = terms.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn("weight", F.round(F.col("tf") / F.col("df"), 6))
    ranked = with_df.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("weight"), F.asc("term")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= 3).select(
        "doc_id", "term", "tf", F.col("df").cast("bigint").alias("df"), "weight", "rank"
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals: vocabulary
    ratio and top-bigram concentration (Rae et al. 2021 §A1.1 use
    duplicate-line and top-n-gram fractions to drop low-quality docs).

    All JVM-side: distinct-word count is an in-plan ``array_distinct``
    (no shuffle); the top-bigram count is the explode → (doc, gram)
    count → per-doc max cascade, whose partial aggregation keeps the
    shuffle at distinct-gram-per-doc cardinality, not corpus tokens.
    The dominant-bigram fraction is a single IEEE division — exact and
    engine-portable, no float summation anywhere."""
    from lexam_data_pipeline_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents", fan=True)
    base = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .withColumn("n_words", F.size("toks"))
        .withColumn("n_distinct_words", F.size(F.array_distinct("toks")))
    )
    grams = base.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.explode(shingles(F.col("toks"), 2)).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "n_words", "n_distinct_words", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_gram.groupBy("doc_id", "n_words", "n_distinct_words").agg(
        F.max("c").alias("top_bigram_n"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
    ).withColumn(
        "top_bigram_frac",
        F.round(F.col("top_bigram_n") / F.greatest(F.col("n_words") - 1, F.lit(1)), 6),
    )


def q_lexical_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring, made engine-exact:
    instead of a float log-prob sum (libm log is not correctly rounded,
    so cross-engine parity would break), score each document by exact
    integer corpus statistics — mean corpus frequency of its tokens and
    its hapax (corpus-unique token) count.  Low mean frequency / high
    hapax fraction marks the same junk a unigram-LM perplexity filter
    targets (CCNet, Wenzek et al. 2019).

    Plan: one aggregate builds the corpus vocabulary (token -> count),
    which broadcasts onto the exploded corpus; the per-doc rollup
    partial-aggregates map-side, so the shuffle carries ~one row per
    (doc, partition), not per token.  At web scale the vocabulary of a
    cleaned corpus is tens of millions of rows — still broadcastable;
    if it isn't (no cleaning, all of CC), the join degrades gracefully
    to a shuffle hash join on the token."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tf").cast("bigint").alias("freq_mass"),
            (F.sum("tf").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_tok_freq"
            ),
            F.sum((F.col("tf") == 1).cast("int")).cast("bigint").alias("n_hapax"),
        )
    )
