"""Corpus-pipeline operators added round 2: decontamination, sequence
packing, repetition stats (ml/decontam.py, ml/curation.py,
ml/textstats.py).

Registry parity proves fixture-query/oracle agreement; these tests pin
operator laws on hand-built inputs and the plan shapes that carry the
100 TB claims (benchmark grams broadcast; packing never single-
partitions the wide side; bucket width cannot change packing results).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.curation import pack_sequences
from lexam_data_pipeline_spark.ml.decontam import decontaminate


def test_decontaminate_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),  # shares a 4-gram
            (2, "completely unrelated words here now"),  # clean
            (3, "quick brown fox jumps and quick brown fox jumps"),  # 2 hits? one distinct gram twice
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps happily"), (101, "quick brown fox jumps")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hit_grams"], r["n_bench_docs"]) for r in
           decontaminate(corpus, bench, n=4).collect()}
    # "quick brown fox jumps" appears in both bench docs; doc 2 is absent.
    assert got == {1: (1, 2), 3: (1, 2)}


def test_decontaminate_broadcasts_benchmark(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = decontaminate(
        docs.where(F.col("doc_id") % 10 != 0), docs.where(F.col("doc_id") % 10 == 0), n=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _packed(spark, docs, **kw):
    return {
        r["doc_id"]: (r["tok_start"], r["seq_id"])
        for r in pack_sequences(docs, "doc_id", "n_tok", **kw).collect()
    }


def test_pack_sequences_contiguous_and_bucket_invariant(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").withColumn(
        "n_tok", F.regexp_count("text", F.lit(r"\S+")).cast("int")
    )
    a = _packed(spark, docs, seq_len=512, bucket_width=16)
    b = _packed(spark, docs, seq_len=512, bucket_width=100_000)  # one bucket
    assert a == b, "bucket width is an implementation detail, not semantics"

    toks = {r["doc_id"]: r["n_tok"] for r in docs.select("doc_id", "n_tok").collect()}
    start = 0
    for did in sorted(toks):
        assert a[did][0] == start, f"doc {did} should start at {start}, got {a[did][0]}"
        assert a[did][1] == start // 512
        start += toks[did]


def test_pack_sequences_only_spine_single_partitions(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").withColumn(
        "n_tok", F.regexp_count("text", F.lit(r"\S+")).cast("int")
    )
    out = pack_sequences(docs, "doc_id", "n_tok", seq_len=512, bucket_width=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one SinglePartition exchange: the tiny bucket spine; the
    # corpus-side window must repartition by bucket, and the offsets
    # must come back via broadcast.
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "BroadcastHashJoin" in plan


def test_segment_dedup_first_occurrence_wins(spark):
    from lexam_data_pipeline_spark.ml.dedup import segment_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # segs: [a b c d], [e f]
            (2, "a b c d x y z w"),    # first seg duplicates doc 1's
            (3, "e f"),                # duplicates doc 1's tail segment
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["tokens_kept"])
        for r in segment_dedup_stats(docs, seg_len=4).collect()
    }
    assert got == {1: (2, 2, 6), 2: (2, 1, 4), 3: (1, 0, 0)}


def test_temperature_mix_rates(spark):
    import hashlib

    from lexam_data_pipeline_spark.ml.curation import temperature_mix

    # big: 16 docs x 4 tokens; small: 4 docs x 4 tokens -> rate_big = 0.5
    rows = [(i, "small" if i < 4 else "big", "w x y z", 4) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string, n_tok long")
    kept = {
        r["doc_id"]
        for r in temperature_mix(docs, "source", F.col("doc_id"), "n_tok").collect()
    }
    thresh = {"small": "ffffffff", "big": format(int(0.5 * 16**8), "08x")}
    expect = {
        i
        for i, src, _, _ in rows
        if hashlib.md5(f"tmix{i}".encode()).hexdigest()[:8] < thresh[src]
    }
    assert kept == expect
    try:
        temperature_mix(docs, "source", F.col("doc_id"), "n_tok", alpha=0.7)
    except ValueError:
        pass
    else:
        raise AssertionError("alpha=0.7 must be rejected (no engine-exact pow)")


def test_cube_and_ntile_invariants(spark, sf_small):
    from lexam_data_pipeline_spark.plans.fixture_queries import (
        q_cube_orders,
        q_ntile_customers,
    )

    cube = q_cube_orders(spark, sf_small).collect()
    total = [r for r in cube if r["gid"] == 3]
    assert len(total) == 1 and total[0]["status"] == "ALL"
    n_orders = load_table(spark, sf_small, "orders").count()
    assert total[0]["n_orders"] == n_orders
    assert sum(r["n_orders"] for r in cube if r["gid"] == 0) == n_orders

    nt = q_ntile_customers(spark, sf_small)
    top = nt.where(F.col("quartile") == 4).select("cd_ceiling").distinct().collect()
    assert [r["cd_ceiling"] for r in top] == [1.0]


def test_lexical_rarity_hand_counts(spark, monkeypatch):
    from lexam_data_pipeline_spark.ml import textstats

    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s0", 5), (2, "a c", "en", "s0", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(textstats, "load_table", lambda *a, **k: docs)
    got = {r["doc_id"]: r for r in textstats.q_lexical_rarity(spark, "ignored").collect()}
    # corpus: a->3, b->1, c->1
    assert (got[1]["n_tokens"], got[1]["freq_mass"], got[1]["n_hapax"]) == (3, 7, 1)
    assert (got[2]["n_tokens"], got[2]["freq_mass"], got[2]["n_hapax"]) == (2, 4, 1)
    assert got[2]["mean_tok_freq"] == 2.0


def test_pretrain_pipeline_conservation(spark, sf_small):
    from lexam_data_pipeline_spark.ml.curation import q_pretrain_pipeline
    from lexam_data_pipeline_spark.functions.text import word_count

    out = q_pretrain_pipeline(spark, sf_small)
    docs = load_table(spark, sf_small, "documents")
    raw = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(word_count(F.col("text"))).alias("t"))
        .collect()
    }
    for r in out.collect():
        assert 0 < r["tokens_kept"] <= raw[r["source"]]


@pytest.mark.slowsuite
def test_pack_sequences_hypothesis_conservation(spark):
    """Property: packing is a prefix-sum — tok_start values are exactly
    the cumulative sums in id order, for random token counts, any
    bucket width, including counts of zero."""
    from hypothesis import given, settings, strategies as st

    from lexam_data_pipeline_spark.ml.curation import pack_sequences

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(
        st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=60),
        st.sampled_from([1, 3, 7, 1000]),
    )
    def check(counts, bucket_width):
        docs = spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tok int"
        )
        out = {
            r["doc_id"]: (r["tok_start"], r["seq_id"])
            for r in pack_sequences(
                docs, "doc_id", "n_tok", seq_len=128, bucket_width=bucket_width
            ).collect()
        }
        start = 0
        for i, c in enumerate(counts):
            assert out[i] == (start, start // 128)
            start += c

    check()


@pytest.mark.slowsuite
def test_segment_dedup_idempotent_on_unique_corpus(spark):
    """Property: with all-distinct segments nothing is dropped, and
    token accounting is conserved (sum seg_tok == word count)."""
    from hypothesis import given, settings, strategies as st

    from lexam_data_pipeline_spark.ml.dedup import segment_dedup_stats

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(st.lists(st.integers(min_value=1, max_value=23), min_size=1, max_size=25))
    def check(lengths):
        # doc i gets tokens "i_0 i_1 ..." — globally unique segments
        docs = spark.createDataFrame(
            [(i, " ".join(f"{i}_{j}" for j in range(n))) for i, n in enumerate(lengths)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r for r in segment_dedup_stats(docs, seg_len=8).collect()
        }
        for i, n in enumerate(lengths):
            r = got[i]
            assert r["n_kept"] == r["n_segments"] == -(-n // 8)
            assert r["tokens_kept"] == n

    check()
