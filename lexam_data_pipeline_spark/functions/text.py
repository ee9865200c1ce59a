"""Text-analysis column expressions (all JVM-side, whole-stage codegen).

These are the building blocks for the dedup / text-quality operator
families.  Everything here is a pure column expression — no UDFs — so the
hot path stays inside Tungsten at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization matching Python ``str.split()``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def word_count(text: Column | str) -> Column:
    """Word count matching Python ``len(s.split())`` (ref main.py:422).

    ``regexp_count(c, '\\S+')``, NOT ``size(split(trim(c)))``: trim strips
    only ASCII spaces, so a ``"\\r"``-only string would count 2 phantom
    words (hypothesis-found divergence; pinned in tests/test_extract.py).
    Counting non-space runs is also whole-stage-codegen-friendly."""
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(F.regexp_count(c, F.lit(r"\S+")), F.lit(0))


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles; a document shorter than ``n`` words yields a
    single shingle holding the whole text (slice clamps identically in
    Spark and DuckDB).

    PERF: pass a *materialized* token column (``.withColumn("toks",
    tokens("text"))`` first), never an inline ``tokens(...)`` expression —
    an expression referenced several times inside a higher-order lambda is
    re-evaluated per array element (the regex split would run once per
    shingle, a ~50× slowdown measured at sf0.1)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def shingle_set(toks: Column, n: int = 3) -> Column:
    """Distinct shingles from a materialized token column (see shingles)."""
    return F.array_distinct(shingles(toks, n))


def min_fingerprint(toks: Column, n: int = 3) -> Column:
    """Deterministic document fingerprint: min(md5) over word n-gram
    shingles — a 1-permutation MinHash, portable across engines.
    Takes a materialized token column (see shingles)."""
    return F.array_min(F.transform(shingles(toks, n), F.md5))


def avg_word_len(toks: Column) -> Column:
    """Exact integer mean of per-token lengths (engine-portable)."""
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    return total / F.size(toks)


def stopword_ratio(toks: Column, stopwords: tuple[str, ...]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.size(toks)


def readability_counts(docs: "DataFrame") -> "DataFrame":  # noqa: F821
    """Per-source (n_docs, words, sentences, syllables) integer sums —
    the shared sufficient statistic of q_readability
    (plans.fixture_queries) and the streaming maintainer
    (streaming/textstats.py).  One definition so the regexes and the
    syllable floor cannot diverge between the batch key and the fold
    (the functions/embeddings.py pattern).  Words are non-space runs,
    sentences [.!?]+ runs floored at 1 per document, syllables
    vowel-run counts floored at the DOCUMENT level (per-doc syllables
    ≥ per-doc words via greatest(vowel_runs, words)); a vowel-rich
    word can therefore offset a vowel-less one, which a true per-word
    floor would not allow."""
    words = F.coalesce(F.regexp_count(F.col("text"), F.lit(r"\S+")), F.lit(0))
    sents = F.greatest(
        F.coalesce(F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(0)),
        F.lit(1),
    )
    vruns = F.coalesce(
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")), F.lit(0)
    )
    per_doc = docs.select(
        "source",
        words.alias("w"),
        sents.alias("st"),
        F.greatest(vruns, words).alias("sy"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("st").alias("sentences"),
        F.sum("sy").alias("syllables"),
    )
