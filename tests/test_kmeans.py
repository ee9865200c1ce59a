"""Independent-oracle verification of the distributed Lloyd's trainer.

The contract key is rows-only (partition-order float sums), so the
oracle is this module: a numpy Lloyd's with the IDENTICAL seeding
(k lowest-vec_id vectors), update (mean of members, empty clusters
frozen), and tiebreak (argmin → lowest id) must agree on centroids,
assignments, and SSE.
"""

from __future__ import annotations

import numpy as np
import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.ivf import _assign
from lexam_data_pipeline_spark.ml.kmeans import (
    K_CLUSTERS,
    N_ITER,
    cluster_stats,
    q_kmeans_clusters,
    train_kmeans,
)
from pyspark.sql import functions as F


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


def _numpy_lloyd(X, k, n_iter):
    C = X[:k].copy()  # rows already sorted by vec_id
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for cid in range(k):
            m = lab == cid
            if m.any():
                C[cid] = X[m].mean(axis=0)
    return C


def test_centroids_match_numpy(base, xs):
    _, X = xs
    C_spark = np.array(train_kmeans(base, K_CLUSTERS, N_ITER))
    C_ref = _numpy_lloyd(X, K_CLUSTERS, N_ITER)
    assert np.allclose(C_spark, C_ref, rtol=1e-8, atol=1e-10)


def test_assignments_and_sse_match(base, xs):
    _, X = xs
    cents = train_kmeans(base, K_CLUSTERS, N_ITER)
    C = np.array(cents)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lab = d.argmin(axis=1)
    sizes_ref = np.bincount(lab, minlength=K_CLUSTERS)
    sse_ref = np.array(
        [
            ((X[lab == cid] - C[cid]) ** 2).sum() if (lab == cid).any() else 0.0
            for cid in range(K_CLUSTERS)
        ]
    )
    got = {
        r["cluster"]: r for r in cluster_stats(base, cents).collect()
    }
    for cid in range(K_CLUSTERS):
        assert got[cid]["n_points"] == sizes_ref[cid]
        assert got[cid]["sse"] == pytest.approx(sse_ref[cid], rel=1e-6, abs=1e-3)
    # spark-side assignment kernel agrees with numpy row-for-row
    a = {
        r["vec_id"]: r["cluster"]
        for r in _assign(base, cents).select("vec_id", "cluster").collect()
    }
    ids, _ = xs
    agree = np.mean([a[i] == lab[j] for j, i in enumerate(ids)])
    assert agree == 1.0


def test_contract_key_shape(spark, sf_small):
    df = q_kmeans_clusters(spark, sf_small)
    rows = df.collect()
    assert df.columns == ["cluster", "n_points", "sse"]
    assert len(rows) == K_CLUSTERS
    assert sum(r["n_points"] for r in rows) == load_table(
        spark, sf_small, "embeddings"
    ).count()
    # a converged clustering is non-degenerate: >1 non-empty cluster
    assert sum(1 for r in rows if r["n_points"] > 0) > 1
