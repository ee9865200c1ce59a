"""Shared embedding-quantization primitives.

The embedding-geometry family (q_embedding_drift / q_embedding_outliers
/ q_silhouette_labels / q_davies_bouldin in plans.fixture_queries, the
streaming maintainer in streaming/centroids.py, and the LATERAL-VIEW
SQL hand ports in plans/sql_surface.py) all depend on ONE quantization:
components floored at ``QUANT_SCALE`` so per-(label, dimension) sums
are exact integers and cross-engine float summation never happens.
This module is the single definition — a scale change here propagates
to every DataFrame builder, and tests/test_round7_operators.py pins the
SQL texts (which are strings and cannot import) to the same literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: component quantization scale: ⌊val · QUANT_SCALE⌋ per component.
#: With unit-normalized float32 embeddings, |qv| ≤ QUANT_SCALE, so the
#: (nl·qv − S)² cross-multiplications stay inside decimal(38).
QUANT_SCALE = 1_000_000.0


def quantized_components(
    emb: DataFrame, *, with_vec_id: bool = True, require_label: bool = False
) -> DataFrame:
    """posexplode ``embedding`` into (vec_id?, label, pos, qv) with
    components quantized to ⌊val·QUANT_SCALE⌋ BIGINT."""
    if require_label:
        emb = emb.where(F.col("label").isNotNull())
    cols = (["vec_id"] if with_vec_id else []) + ["label"]
    return emb.select(
        *cols, F.posexplode("embedding").alias("pos", "val")
    ).select(
        *cols,
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(QUANT_SCALE))
        .cast("bigint")
        .alias("qv"),
    )


def label_dim_sums(comp: DataFrame, *, with_counts: bool = True) -> DataFrame:
    """(label, pos) integer component sums — the bounded k·d-row table
    every pairwise centroid computation joins instead of raw vectors."""
    aggs = [F.sum("qv").alias("s")]
    if with_counts:
        aggs.append(F.count(F.lit(1)).alias("nl"))
    return comp.groupBy("label", "pos").agg(*aggs)
