"""Oracle for the rows-only PCA key: the one-pass distributed moments
must reproduce the exact covariance (numpy on the collected corpus),
and the deflated power iteration must agree with ``numpy.linalg.eigh``
eigenvalues / explained-variance shares.
"""

from __future__ import annotations

import numpy as np
import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.pca import (
    N_COMPONENTS,
    corpus_moments,
    q_pca_variance,
    top_components,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cov_pair(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    base = emb.select(F.col("embedding").cast("array<double>").alias("e"))
    n, mu, cov = corpus_moments(base)
    X = np.array([r["e"] for r in base.collect()])
    cov_ref = np.cov(X, rowvar=False, bias=True)
    return n, mu, cov, X, cov_ref


def test_moments_match_numpy(cov_pair):
    n, mu, cov, X, cov_ref = cov_pair
    assert n == len(X)
    assert np.allclose(mu, X.mean(axis=0), rtol=1e-10)
    assert np.allclose(cov, cov_ref, rtol=1e-8, atol=1e-10)


def test_power_iteration_matches_eigh(cov_pair):
    _, _, cov, _, cov_ref = cov_pair
    lams = [lam for lam, _ in top_components(cov, N_COMPONENTS)]
    ref = np.sort(np.linalg.eigvalsh(cov_ref))[::-1][:N_COMPONENTS]
    assert np.allclose(lams, ref, rtol=1e-6)


def test_contract_key_shape(spark, sf_small, cov_pair):
    _, _, _, _, cov_ref = cov_pair
    df = q_pca_variance(spark, sf_small)
    rows = df.collect()
    assert df.columns == ["component", "eigenvalue", "var_share", "cum_share"]
    assert [r["component"] for r in rows] == list(range(1, N_COMPONENTS + 1))
    # eigenvalues descend; shares in (0,1]; cumulative monotone
    lams = [r["eigenvalue"] for r in rows]
    assert lams == sorted(lams, reverse=True)
    ref = np.sort(np.linalg.eigvalsh(cov_ref))[::-1][:N_COMPONENTS]
    assert lams == pytest.approx(ref, rel=1e-4)
    cums = [r["cum_share"] for r in rows]
    assert all(0.0 < c <= 1.0 + 1e-9 for c in cums)
    assert cums == sorted(cums)
