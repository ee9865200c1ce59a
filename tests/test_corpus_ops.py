"""Corpus-pipeline operators added round 2: decontamination, sequence
packing, repetition stats (ml/decontam.py, ml/curation.py,
ml/textstats.py).

Registry parity proves fixture-query/oracle agreement; these tests pin
operator laws on hand-built inputs and the plan shapes that carry the
100 TB claims (benchmark grams broadcast; packing never single-
partitions the wide side; bucket width cannot change packing results).
"""

from __future__ import annotations

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
