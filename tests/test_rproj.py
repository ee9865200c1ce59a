"""Semantic checks for the JL random-projection key (its exactness is
oracle-checked via the generated balanced-tree SQL twin; these pin the
lemma-level behavior on top)."""

from __future__ import annotations

from lexam_data_pipeline_spark.ml.rproj import q_random_projection


def test_random_projection_jl_concentration(spark, sf_small):
    """JL ratios are positive and concentrate around 1 (the lemma's
    expectation); NULL ratios (identical leading-64 pairs) are legal but
    must not occur in the fixture."""
    rows = q_random_projection(spark, sf_small).collect()
    assert len(rows) == 50
    ratios = [r["jl_ratio"] for r in rows]
    assert all(x is not None and x > 0 for x in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5
