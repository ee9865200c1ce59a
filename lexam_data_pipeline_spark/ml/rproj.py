"""Johnson–Lindenstrauss random projection with a distance-preservation
audit — the dimensionality-reduction primitive a 100 TB embedding
pipeline runs before ANN indexing / clustering (Achlioptas 2003: ±1
sign matrices satisfy the JL lemma; public method).

Engine-portable float linear algebra, fully oracle-checked: the ±1 sign
matrix is derived on the DRIVER from md5 parity (hashlib here, the SAME
Python function generating the oracle SQL's literals — no engine hash
involved), every sum is the repo's balanced adjacent-pair tree
(:func:`ml.dedup._balanced_sum` / ``ml.registry._balanced_sum_sql`` —
identical parenthesization → bit-identical doubles), negation and
subtraction are exact IEEE ops, and the one division chain is written
with the same association on both engines.

Scale: the projection is a MAP — each row reads its 64 floats and emits
8 signed balanced sums; no shuffle, no model state (the sign matrix is
literal coefficients baked into the plan).  The audit pairs row v with
row v+:data:`RP_PAIR_STEP` via one equi-join (at 100 TB you'd sample
pairs the same way); top-50 by id is a TakeOrdered.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.dedup import _balanced_sum

#: Input embedding width.
RP_DIM = 64

#: Projected width (k in the JL bound; kept at 8 so the generated
#: projection stays ~500 scalar terms — inside janino's 64 KB method
#: budget, see the verify-skill gotcha).
RP_K = 8

#: Audit pairs: vec_id v vs v + step.
RP_PAIR_STEP = 17


def rp_signs(k: int = RP_K, d: int = RP_DIM) -> list[list[int]]:
    """The ±1 sign matrix, derived from md5 parity of ``rp_{j}_{i}`` on
    the driver — the SAME function feeds the oracle SQL generator, so
    both engines see identical literal coefficients."""
    return [
        [
            1
            if int(hashlib.md5(f"rp_{j}_{i}".encode()).hexdigest()[0], 16) < 8
            else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


def _projected(emb: DataFrame) -> DataFrame:
    """vec_id, x0..x{d-1} (double), y0..y{k-1} (signed balanced sums)."""
    signs = rp_signs()
    xs = [
        F.element_at("embedding", i + 1).cast("double").alias(f"x{i}")
        for i in range(RP_DIM)
    ]
    base = emb.where(F.size("embedding") >= RP_DIM).select("vec_id", *xs)
    ys = [
        _balanced_sum(
            [
                F.col(f"x{i}") if signs[j][i] == 1 else -F.col(f"x{i}")
                for i in range(RP_DIM)
            ]
        ).alias(f"y{j}")
        for j in range(RP_K)
    ]
    return base.select("vec_id", *[F.col(f"x{i}") for i in range(RP_DIM)], *ys)


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 projection 64→8 dims and its distance-preservation audit:
    for each (v, v+17) pair, the squared original distance, the squared
    projected distance, and the JL ratio ``proj² / (k · orig²)``
    (expectation 1 by the lemma).  Top-50 pairs by id.

    Fully oracle-checked: identical balanced-tree float sums and literal
    sign coefficients on both engines (module docstring).

    DRIVER-bound key: ~85% of its cost is Catalyst analysis of the
    ~4.6k-term literal projection tree (construct/exec split probe:
    ~4.6 s fresh construct vs ~0.8 s re-executing the same object), so
    it is in plans/registry.MEMO_SAFE_KEYS — construction is action-free
    and repeated calls reuse the analyzed plan (r11 VERDICT item 3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = _projected(emb)
    # Deliberately left on the r10 shape after two negative A/Bs (r11):
    # this key's measured cost is DRIVER-side Catalyst work on the
    # ~4.6k-term literal projection (probe: fresh-plan run 4.5 s vs
    # 0.65 s re-executing the same DataFrame), and neither a slot
    # persist (6.04/6.13 min — cuts no analysis) nor a localCheckpoint
    # of the projection (5.08/5.01 min, wash — the analysis cost lives
    # in the projection subtree itself, which the checkpoint still
    # plans once per construction) moved it.  A smaller tree would
    # change the balanced-sum parenthesization the oracle mirrors.
    a = proj.alias("a")
    b = proj.alias("b")
    pairs = a.join(
        b, F.col("b.vec_id") == F.col("a.vec_id") + RP_PAIR_STEP
    )
    orig_d2 = _balanced_sum(
        [
            (F.col(f"a.x{i}") - F.col(f"b.x{i}"))
            * (F.col(f"a.x{i}") - F.col(f"b.x{i}"))
            for i in range(RP_DIM)
        ]
    )
    proj_d2 = _balanced_sum(
        [
            (F.col(f"a.y{j}") - F.col(f"b.y{j}"))
            * (F.col(f"a.y{j}") - F.col(f"b.y{j}"))
            for j in range(RP_K)
        ]
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(orig_d2, 6).alias("orig_d2"),
            F.round(proj_d2, 6).alias("proj_d2"),
            F.round(
                proj_d2
                / F.nullif(F.lit(float(RP_K)) * orig_d2, F.lit(0.0)),
                6,
            ).alias("jl_ratio"),
        )
        .orderBy("a_id")
        .limit(50)
    )
