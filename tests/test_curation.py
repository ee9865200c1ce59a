"""Curation operators: deterministic sampling, PII redaction, URL
canonicalization (ml/curation.py).

The registry parity tests already prove the fixture queries match DuckDB;
these tests pin the *operator* behavior on realistic messy inputs the
synthetic corpus can't produce, plus the sampling laws the module
advertises (determinism, threshold nesting, prefilter exactness).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.curation import (
    extract_domain,
    hash_sample,
    hex_threshold,
    normalize_url,
    redact_pii,
    stratified_sample,
)


def _one(spark, s: str, expr) -> str:
    return spark.createDataFrame([(s,)], "s string").select(expr(F.col("s")).alias("v")).first()["v"]


def test_redact_pii_realistic_strings(spark):
    cases = {
        "mail me at jane.doe+tag@sub.example.co.uk today":
            "mail me at <EMAIL> today",
        "server 192.168.001.1 and 8.8.8.8 are up":
            "server <IP> and <IP> are up",
        "call +41-79-1234567 or +1-800-55501234":
            "call <PHONE> or <PHONE>",
        "see https://user:pw@ex.com/a?b=c#d for details":
            "see <URL> for details",
        # an email inside a URL redacts as part of the URL (order pin)
        "https://ex.com/u/a@b.com trailing":
            "<URL> trailing",
        "no pii here, just 1.5 liters and v2.0":
            "no pii here, just 1.5 liters and v2.0",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, redact_pii) == want, raw


def test_normalize_url_messy_inputs(spark):
    cases = {
        "HTTPS://WWW.Example.COM:8443/Path/To/Page?utm=x#frag": "example.com/path/to/page",
        "http://example.com/": "example.com",
        "http://example.com": "example.com",
        "https://sub.example.com/a/b": "sub.example.com/a/b",
        "http://www.example.com?q=1": "example.com",
        # not an absolute http(s) URL → empty canonical form
        "ftp://example.com/x": "",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, normalize_url) == want, raw
    assert _one(spark, "HTTPS://WWW.Ex.COM:80/x", extract_domain) == "ex.com"


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.25) == "40000000"
    assert hex_threshold(1.0) == "ffffffff"


def test_hash_sample_deterministic_and_nested(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    key = F.col("doc_id")
    s10 = {r["doc_id"] for r in hash_sample(docs, key, 0.10).select("doc_id").collect()}
    s10b = {r["doc_id"] for r in hash_sample(docs, key, 0.10).select("doc_id").collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, key, 0.30).select("doc_id").collect()}
    assert s10 == s10b  # same decision every run
    assert s10 <= s30  # thresholds nest: growing the rate extends the sample
    n = docs.count()
    assert 0.05 * n <= len(s10) <= 0.15 * n
    # distinct salts give (near-)independent samples, not the same rows
    salted = {r["doc_id"] for r in hash_sample(docs, key, 0.10, salt="v2").select("doc_id").collect()}
    assert salted != s10


def test_stratified_prefilter_is_exact(spark, sf_small):
    """The 0.5-rate fast path must select exactly the unfiltered top-k."""
    docs = load_table(spark, sf_small, "documents")
    key = F.col("doc_id")
    fast = stratified_sample(docs, "lang", key, k=10, prefilter_rate=0.5)
    full = stratified_sample(docs, "lang", key, k=10, prefilter_rate=None)
    cols = ["lang", "doc_id", "sample_rank"]
    assert sorted(map(tuple, fast.select(cols).collect())) == sorted(
        map(tuple, full.select(cols).collect())
    )
    counts = {r["lang"]: r["n"] for r in fast.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values())


def test_curation_pipeline_plan_shape(spark, sf_small):
    """The composed cleaning pipeline must stay one shuffle: gate and
    sample are map-only; only the content-hash dedup window exchanges."""
    from lexam_data_pipeline_spark.ml.curation import q_curation_pipeline

    plan = q_curation_pipeline(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = sum(
        1 for ln in plan.splitlines() if ln.lstrip("+- :*( ").startswith("Exchange")
    )
    assert n_exchanges == 1, f"expected exactly 1 shuffle, saw {n_exchanges}:\n{plan}"
    assert "BatchEvalPython" not in plan and "Python" not in plan


def test_mix_to_budget_balances_sources(spark, sf_small):
    """Balanced mix: the smallest source keeps everything (rate 1.0) and
    every source's post-mix token total lands near the shared budget."""
    from lexam_data_pipeline_spark.functions.text import word_count
    from lexam_data_pipeline_spark.ml.curation import mix_to_budget

    docs = load_table(spark, sf_small, "documents").withColumn(
        "n_tok", word_count(F.col("text")).cast("int")
    )
    totals = {r["source"]: r["t"] for r in docs.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
    budget = min(totals.values())
    min_source = min(totals, key=totals.get)

    mixed = mix_to_budget(docs, "source", F.col("n_tok"), F.col("doc_id"))
    kept = {
        r["source"]: (r["n"], r["t"])
        for r in mixed.groupBy("source").agg(F.count("*").alias("n"), F.sum("n_tok").alias("t")).collect()
    }
    assert len(kept) == len(totals)  # no source dropped entirely
    assert kept[min_source][1] == budget  # rate-1.0 source keeps every token
    for src, (_, tok) in kept.items():
        assert 0.5 * budget <= tok <= 1.5 * budget, (src, tok, budget)

    # corpus body must not shuffle: thresholds broadcast-join onto docs
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_windows_covers_every_token_exactly(spark):
    """Chunk starts step by the stride; the final (possibly short) chunk
    reaches exactly the last token, and consecutive chunks overlap by
    window - stride tokens."""
    from lexam_data_pipeline_spark.ml.curation import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # multiple chunks
            (2, " ".join(f"t{i}" for i in range(32))),   # exactly one window
            (3, "solo"),                                 # shorter than window
            (4, " ".join(f"t{i}" for i in range(25))),   # start lands on n-? edge
        ],
        "doc_id long, text string",
    )
    rows = chunk_windows(docs, window=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,24,48,72,96 — last chunk holds tokens 96..99
    starts = sorted(r["chunk_start"] for r in by_doc[1])
    assert starts == [0, 24, 48, 72, 96]
    last = max(by_doc[1], key=lambda r: r["chunk_start"])
    assert last["n_chunk_tokens"] == 4 and last["first_tok"] == "t96"
    # full chunks are exactly `window` long
    assert all(
        r["n_chunk_tokens"] == 32 for r in by_doc[1] if r["chunk_start"] <= 68
    )
    # doc 2: 32 tokens -> starts 0 and 24 (the tail re-covers the overlap)
    assert sorted(r["chunk_start"] for r in by_doc[2]) == [0, 24]
    # doc 3: single short chunk, chunk covers the whole doc
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in by_doc[3]] == [(0, 1)]
    # doc 4: 25 tokens -> second chunk is the single trailing token
    assert sorted((r["chunk_start"], r["n_chunk_tokens"]) for r in by_doc[4]) == [
        (0, 25),
        (24, 1),
    ]


def test_split_assign_deterministic_and_partitioned(spark):
    """Same key -> same split on every call; splits partition the corpus
    with roughly 12/2/2 hex-char mass."""
    from lexam_data_pipeline_spark.ml.curation import split_assign

    ids = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    a = ids.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    b = ids.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    assert a == b
    counts = {}
    for r in a:
        counts[r["s"]] = counts.get(r["s"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 4000 == pytest.approx(12 / 16, abs=0.05)
    assert counts["val"] / 4000 == pytest.approx(2 / 16, abs=0.03)
    assert counts["test"] / 4000 == pytest.approx(2 / 16, abs=0.03)


class TestKFold:
    def test_kfold_partition_properties(self, spark, sf_small):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.ml.curation import kfold_assign
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_small, "documents")
        folded = docs.withColumn("fold", kfold_assign(F.col("doc_id"), k=5))
        counts = {r["fold"]: r["count"] for r in folded.groupBy("fold").count().collect()}
        assert set(counts) == {0, 1, 2, 3, 4}  # every fold populated
        n = sum(counts.values())
        assert n == docs.count()  # a partition: no row lost or duplicated
        assert max(counts.values()) < 2 * min(counts.values())  # near-uniform
        # stability: re-computation assigns identical folds
        again = docs.withColumn("fold", kfold_assign(F.col("doc_id"), k=5))
        assert folded.select("doc_id", "fold").exceptAll(
            again.select("doc_id", "fold")
        ).count() == 0

    def test_k_must_be_at_least_two(self, spark):
        import pytest as _pytest
        from lexam_data_pipeline_spark.ml.curation import kfold_assign
        from pyspark.sql import functions as F

        with _pytest.raises(ValueError):
            kfold_assign(F.col("x"), k=1)
