"""Expression-level Bloom filter (ml/bloom.py).

The contract has two halves:

* NO false negatives, ever — a miss would silently drop real
  contamination, so this is exhaustively asserted, not sampled;
* a measured false-positive rate near the design fpp — a bloom whose
  probe logic is broken usually fails open (fp ≈ 100%, prefilter does
  nothing) or fails closed (false negatives); both are caught here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.bloom import (
    bloom_build,
    bloom_filter,
    q_bloom_decontaminate,
)
from lexam_data_pipeline_spark.ml.decontam import decontaminate
from lexam_data_pipeline_spark.ml.registry import ML_ORACLES
from lexam_data_pipeline_spark.testing import compare_query, duckdb_connection


@pytest.fixture(scope="module")
def keyed(spark):
    # 2000 member keys, 20000 non-member probes, disjoint by construction
    members = spark.range(2000).select(F.concat(F.lit("in-"), "id").alias("k"))
    probes = spark.range(20000).select(F.concat(F.lit("out-"), "id").alias("k"))
    return members, probes


def test_no_false_negatives(spark, keyed):
    members, _ = keyed
    m_bits, k = 1 << 14, 3
    bloom = bloom_build(members, "k", m_bits, k)
    kept = bloom_filter(members, F.col("k"), bloom, m_bits, k).count()
    assert kept == members.count()


def test_false_positive_rate_near_design(spark, keyed):
    members, probes = keyed
    m_bits, k = 1 << 14, 3  # n=2000, m=16384 -> theoretical fpp ~ 2.4%
    bloom = bloom_build(members, "k", m_bits, k)
    fp = bloom_filter(probes, F.col("k"), bloom, m_bits, k).count()
    rate = fp / 20000
    assert 0.0 < rate < 0.08, rate  # >0 proves probes actually test bits


def test_bloom_words_are_sparse_and_nonzero(spark, keyed):
    members, _ = keyed
    bloom = bloom_build(members, "k", 1 << 14, 3)
    assert len(bloom) == (1 << 14) // 64
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in bloom)
    # k*n minus collisions; all-zero or all-ones both indicate a broken build
    assert 4000 < set_bits < 6000, set_bits


def test_prefilter_output_identical_to_exact(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    exact = decontaminate(
        docs.where(F.col("doc_id") % 7 != 0), docs.where(F.col("doc_id") % 7 == 0), n=5
    )
    got = {
        (r.doc_id, r.n_hit_grams, r.n_bench_docs)
        for r in q_bloom_decontaminate(spark, sf_oracle).collect()
    }
    want = {(r.doc_id, r.n_hit_grams, r.n_bench_docs) for r in exact.collect()}
    assert got == want and got


def test_oracle_parity(spark, sf_oracle):
    con = duckdb_connection(sf_oracle)
    res = compare_query(
        spark,
        con,
        "q_bloom_decontaminate",
        q_bloom_decontaminate,
        ML_ORACLES["q_bloom_decontaminate"],
        sf_oracle,
    )
    assert res.ok, res.mismatches
