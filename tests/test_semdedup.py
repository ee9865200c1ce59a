"""Independent-oracle verification of SemDeDup (kmeans partition +
within-cluster greedy cosine pruning).

The contract key is rows-only (float centroids/cosines), so the oracle
is this module: a numpy replica of all three stages — identical
seeding/update/tiebreak Lloyd's, identical argmin assignment, identical
lowest-id-survivor greedy prune — must agree on every per-cluster
count.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.ivf import _assign
from lexam_data_pipeline_spark.ml.kmeans import K_CLUSTERS, N_ITER, train_kmeans
from lexam_data_pipeline_spark.ml.semdedup import (
    TAU,
    q_semantic_dedup,
    semantic_dedup_stats,
)


@pytest.fixture(scope="module")
def base(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    b = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).persist()
    b.count()
    yield b
    b.unpersist()


@pytest.fixture(scope="module")
def xs(base):
    rows = sorted(base.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["e"] for r in rows])
    return ids, X


def _greedy_prune(S, tau):
    n = S.shape[0]
    kept = np.ones(n, dtype=bool)
    for i in range(n):
        if not kept[i]:
            continue
        kept[(S[i] > tau) & (np.arange(n) > i)] = False
    return kept


def _numpy_semdedup(X, centroids, tau):
    C = np.array(centroids)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lab = d.argmin(axis=1)
    out = {}
    for cid in np.unique(lab):
        M = X[lab == cid]  # X is vec_id-sorted, so member order matches
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        Mn = M / nrm
        kept = _greedy_prune(Mn @ Mn.T, tau)
        out[int(cid)] = (len(M), int(kept.sum()))
    return out


def test_per_cluster_counts_match_numpy(base, xs):
    _, X = xs
    cents = train_kmeans(base, K_CLUSTERS, N_ITER)
    ref = _numpy_semdedup(X, cents, TAU)
    got = {
        r["cluster"]: r
        for r in semantic_dedup_stats(_assign(base, cents), TAU).collect()
    }
    assert set(got) == set(ref)
    for cid, (n, kept) in ref.items():
        assert got[cid]["n_vectors"] == n
        assert got[cid]["n_kept"] == kept
        assert got[cid]["n_dropped"] == n - kept


def test_contract_key_shape(spark, sf_small, base):
    df = q_semantic_dedup(spark, sf_small)
    rows = df.collect()
    assert df.columns == ["cluster", "n_vectors", "n_kept", "n_dropped"]
    assert sum(r["n_vectors"] for r in rows) == base.count()
    # threshold is calibrated to actually prune on the fixture corpus
    assert sum(r["n_dropped"] for r in rows) > 0
    # and not degenerate: most of the corpus survives
    assert sum(r["n_kept"] for r in rows) > base.count() // 2
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]
