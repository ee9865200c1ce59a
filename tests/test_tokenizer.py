"""BPE tokenizer (ml/tokenizer.py): training determinism, inference
equivalence with an independent reference, Spark integration."""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.ml.tokenizer import (
    EOW,
    apply_bpe,
    capped_word_counts,
    encode_word,
    q_bpe_tokenize,
    train_bpe,
    train_bpe_from_counts,
)


def _ref_bpe(corpus: dict[str, int], n_merges: int):
    """Independent reference: straight transcription of the classic
    Sennrich et al. pseudocode (dict-of-space-joined-symbols form)."""
    vocab = {" ".join(list(w) + [EOW]): f for w, f in corpus.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, freq in vocab.items():
            syms = word.split()
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        old = " ".join(best)
        new = "".join(best)
        next_vocab = {}
        for word, freq in vocab.items():
            out = []
            syms = word.split()
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = " ".join(out)
            next_vocab[key] = next_vocab.get(key, 0) + freq
        vocab = next_vocab
    return merges


CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2}


class TestTraining:
    def test_matches_reference_merges(self):
        counts = list(CORPUS.items())
        assert train_bpe_from_counts(counts, 8) == _ref_bpe(CORPUS, 8)

    def test_first_merge_is_most_frequent_pair(self):
        # 'es' appears in newest(6) + widest(3) = 9 — the top pair
        merges = train_bpe_from_counts(list(CORPUS.items()), 1)
        assert merges == [("e", "s")]

    def test_deterministic_tiebreak(self):
        # two pairs with equal count → lexicographically smaller wins
        merges = train_bpe_from_counts([("ab", 3), ("cd", 3)], 1)
        assert merges == [("a", "b")]

    def test_exhausts_gracefully(self):
        merges = train_bpe_from_counts([("ab", 1)], 100)
        assert len(merges) == 2  # a+b, then ab+</w>, then no pairs left


class TestEncoding:
    def test_encode_follows_training(self):
        merges = train_bpe_from_counts(list(CORPUS.items()), 8)
        ranks = {p: i for i, p in enumerate(merges)}
        # a trained word should collapse far below char count
        assert len(encode_word("newest", ranks)) <= 3
        # unseen word degrades to chars + learned bits, never crashes
        toks = encode_word("xyz", ranks)
        assert "".join(toks) == "xyz" + EOW

    def test_zero_merges_is_chars(self):
        assert encode_word("ab", {}) == ["a", "b", EOW]


class TestBoundedCollect:
    """The driver-side collect in train_bpe must be capped: at 100 TB the
    distinct-word table is 10^8+ rows and an uncapped collect OOMs the
    driver (round-3 verdict item 1)."""

    def _heavy_tail_docs(self, spark):
        # 400 singleton "hash-like" words (the unbounded tail) + a small
        # head of genuinely frequent words.
        head = " ".join(["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 20)
        tail_rows = [(i + 2, f"w{i:04d}x{i % 7}") for i in range(400)]
        rows = [(1, head)] + tail_rows
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_collect_bounded_by_max_words(self, spark):
        docs = self._heavy_tail_docs(spark)
        capped = capped_word_counts(docs, max_words=50).collect()
        assert len(capped) <= 50
        # the head survives the cap (top-frequency words win)
        kept = {r["word"] for r in capped}
        assert {"alpha", "beta", "gamma"} <= kept

    def test_min_freq_prunes_singletons(self, spark):
        docs = self._heavy_tail_docs(spark)
        capped = capped_word_counts(docs, min_freq=2, max_words=None).collect()
        assert {r["word"] for r in capped} == {"alpha", "beta", "gamma"}

    def test_fixture_merges_identical_with_and_without_cap(self, spark, sf_small):
        from lexam_data_pipeline_spark.catalog import load_table

        docs = load_table(spark, sf_small, "documents").limit(80)
        uncapped = train_bpe(docs, 12, max_words=None)
        capped = train_bpe(docs, 12)  # default 1M cap
        assert capped == uncapped

    def test_cap_determinism_on_frequency_ties(self, spark):
        # tie-broken by word asc: cap of 2 over 3 equal-freq words must
        # always keep the lexicographically smallest two
        docs = spark.createDataFrame(
            [(1, "bb aa cc"), (2, "cc aa bb")], "doc_id long, text string"
        )
        kept = {r["word"] for r in capped_word_counts(docs, max_words=2).collect()}
        assert kept == {"aa", "bb"}


class TestSparkIntegration:
    def test_apply_bpe_respects_text_col(self, spark):
        # regression: the Arrow closure used to hard-code pdf["text"],
        # so any non-default text_col raised KeyError at runtime
        docs = spark.createDataFrame(
            [(1, "low low newest")], "doc_id long, body string"
        )
        merges = [("l", "o"), ("lo", "w")]
        row = apply_bpe(docs, merges, text_col="body").collect()[0]
        assert row["n_words"] == 3
        ranks = {p: i for i, p in enumerate(merges)}
        want = 2 * len(encode_word("low", ranks)) + len(encode_word("newest", ranks))
        assert row["n_tokens"] == want

    def test_apply_matches_driver_encoding(self, spark):
        rows = [(1, "low low newest"), (2, "widest new lower")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        merges = train_bpe(docs, 6)
        got = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in apply_bpe(docs, merges).collect()}
        ranks = {p: i for i, p in enumerate(merges)}
        for doc_id, text in rows:
            words = text.split()
            want = sum(len(encode_word(w, ranks)) for w in words)
            assert got[doc_id] == (len(words), want)

    def test_fixture_query_fertility_sane(self, spark, sf_small):
        rows = {r["lang"]: r for r in q_bpe_tokenize(spark, sf_small).collect()}
        assert rows
        for r in rows.values():
            # with 30 merges on word-soup text, fertility lands between
            # 1 (everything merged) and the raw chars-per-word bound
            assert 1.0 <= r["fertility"] < 8.0
            assert r["total_tokens"] >= r["total_words"]

    def test_more_merges_never_increase_tokens(self, spark, sf_small):
        from lexam_data_pipeline_spark.catalog import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_small, "documents").limit(50)
        few = train_bpe(docs, 5)
        many = train_bpe(docs, 25)
        assert few == many[:5]  # greedy prefix property
        t_few = apply_bpe(docs, few).agg(F.sum("n_tokens")).collect()[0][0]
        t_many = apply_bpe(docs, many).agg(F.sum("n_tokens")).collect()[0][0]
        assert t_many <= t_few
