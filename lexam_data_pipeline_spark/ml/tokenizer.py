"""BPE tokenizer: distributed training + Arrow-batched application.

The engine's token accounting so far is regex-based (ml/textstats.py
``TOKEN_REGEX``); real corpus curation budgets in *trained-tokenizer*
tokens.  This module implements GPT-2-style word-level byte-pair
encoding the way production tokenizer trainers do:

* **Word counting is the distributed part** — one ``groupBy(word)``
  over the corpus (map-side combined; the shuffle carries the distinct
  vocabulary, not the corpus).  By Zipf's law the distinct-word table is
  orders of magnitude smaller than the text, so this is the only stage
  that must scale.
* **The merge loop runs on the collected vocab** — standard practice
  (HF ``tokenizers`` does the same): each iteration counts weighted
  symbol pairs over O(|vocab|) word shapes and greedily merges the most
  frequent pair, ties broken lexicographically for determinism.
* **Application is an Arrow-batched ``mapInPandas``** with the learned
  merge ranks shipped inside a self-contained closure (executors need
  neither this package nor any library).

Not ANSI-SQL-expressible (iterative greedy merges), so the fixture query
is rows-only for the driver; tests/test_tokenizer.py verifies against an
independent pure-Python reference implementation instead.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.functions.text import tokens

#: end-of-word marker (GPT-2 uses a leading space convention; a suffix
#: marker keeps the fixture vocab printable)
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequencies — the one corpus-scale aggregation."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe_from_counts(counts: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over ``(word, freq)`` pairs.

    Deterministic: best pair by (count desc, pair lexicographic asc).
    Pure Python on the O(|vocab|) table — callers collect the distributed
    word counts first (:func:`word_counts`).
    """
    shapes: dict[tuple[str, ...], int] = {}
    for word, freq in counts:
        shape = tuple(word) + (EOW,)
        shapes[shape] = shapes.get(shape, 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for shape, freq in shapes.items():
            for a, b in zip(shape, shape[1:]):
                pair_counts[(a, b)] += freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged_sym = best[0] + best[1]
        new_shapes: dict[tuple[str, ...], int] = {}
        for shape, freq in shapes.items():
            out = []
            i = 0
            while i < len(shape):
                if i + 1 < len(shape) and (shape[i], shape[i + 1]) == best:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(shape[i])
                    i += 1
            key = tuple(out)
            new_shapes[key] = new_shapes.get(key, 0) + freq
        shapes = new_shapes
    return merges


#: default cap on the vocabulary collected to the driver.  At 100 TB the
#: distinct-word table is 10^8–10^9 rows (URLs, hex hashes, typos); an
#: uncapped ``collect`` OOMs the driver.  1M words ≈ tens of MB of driver
#: state and is far above any tokenizer training vocabulary (HF trainers
#: apply the same ``min_frequency``/vocab-size bounds), so fixture merges
#: are byte-identical with or without the cap.
DEFAULT_MAX_WORDS = 1_000_000


def capped_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int | None = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """:func:`word_counts` bounded for driver collection.

    ``min_freq`` prunes the heavy tail map-side-combined counts cheaply;
    ``max_words`` is a TakeOrdered top-K (freq desc, word asc for
    determinism) so the driver never holds more than ``max_words`` rows
    regardless of corpus size.
    """
    wc = word_counts(docs, text_col)
    if min_freq > 1:
        wc = wc.where(F.col("freq") >= min_freq)
    if max_words is not None:
        wc = wc.orderBy(F.col("freq").desc(), F.col("word")).limit(max_words)
    return wc


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int | None = DEFAULT_MAX_WORDS,
) -> list[tuple[str, str]]:
    """Distributed word count → driver-side merge loop (O(vocab) state,
    the same split HF tokenizer training uses).

    The collect is bounded by ``min_freq``/``max_words`` (default 1M
    top-frequency words) so driver memory is O(cap), not O(distinct
    words in the corpus).
    """
    wc = capped_word_counts(docs, text_col, min_freq=min_freq, max_words=max_words)
    counts = [(r["word"], r["freq"]) for r in wc.collect()]
    return train_bpe_from_counts(counts, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank pair first — the
    standard BPE inference order, equivalent to replaying training)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Tokenize with learned merges: ``doc_id, n_words, n_tokens``.

    Arrow-batched; the closure is fully self-contained (merge ranks are
    captured by value, the encoder is defined inside the closure) so
    executor workers need nothing importable.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    eow = EOW

    def run(batches):
        import pandas as _pd

        def enc(word):
            syms = list(word) + [eow]
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i, pair in enumerate(zip(syms, syms[1:])):
                    r = ranks.get(pair)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        for pdf in batches:
            n_words, n_tokens = [], []
            for text in pdf["text"]:
                words = (text or "").split()
                n_words.append(len(words))
                n_tokens.append(sum(len(enc(w)) for w in words))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": _pd.Series(n_words, dtype="int64"),
                    "n_tokens": _pd.Series(n_tokens, dtype="int64"),
                }
            )

    # Alias the chosen column to the literal name the closure reads, so a
    # non-default text_col works (the closure hard-coding pdf["text"] with
    # text_col="body" used to KeyError at runtime).
    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        run, schema="doc_id long, n_words long, n_tokens long"
    )


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 30 merges on the fixture corpus, tokenize it, and report
    per-language token totals + fertility (tokens per word) — the
    budget-planning numbers a curation pipeline needs.  Rows-only for
    the driver (iterative greedy merges aren't ANSI SQL);
    tests/test_tokenizer.py is the oracle via an independent pure-Python
    reference."""
    docs = load_table(spark, sf_dir, "documents", fan=True)
    merges = train_bpe(docs, n_merges=30)
    counts = apply_bpe(docs, merges)
    joined = counts.join(docs.select("doc_id", "lang"), "doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.sum("n_words"), 4).alias("fertility"),
    )
