"""Count-min sketch: mergeable frequency sketch for heavy-hitter
detection without an unbounded groupBy.

The 100 TB problem: "which tokens appear ≥ T times in the corpus" via a
plain groupBy shuffles EVERY token occurrence — the long tail (which is
almost everything, by Zipf) pays full shuffle cost just to be discarded
by the HAVING.  A count-min sketch bounds the aggregate state at
``d × w`` cells regardless of vocabulary size: the only full-data
aggregation groups by (depth, bucket) — map-side combinable, output
``d*w`` rows — and the per-occurrence estimate is ``min`` over ``d``
bucket counts, obtained here as ``d`` chained BROADCAST joins (the same
no-big-array-in-rows probe shape as :mod:`ml.bloom`; measured there,
an array-literal probe degrades 4-10× when codegen breaks).

CMS can only OVER-estimate (hash collisions add, never subtract), so
``estimate ≥ T`` keeps every true heavy hitter: the exact confirm
groupBy then runs on candidate occurrences only — the tail never
shuffles.  Output is exactly the true heavy-hitter set, which is what
makes the fixture query oracle-checkable (plain GROUP BY/HAVING SQL).

Public background: Cormode & Muthukrishnan 2005 ("An improved data
stream summary: the count-min sketch and its applications").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.functions.text import tokens

#: w=2048 buckets × d=4 rows.  Expected collision inflation per cell is
#: N/w occurrences; with the fixture's ~2.5M token occurrences at sf0.1
#: that is ~1.2k — fine for a T≈2k threshold IF taking the min over 4
#: independent rows (P[all 4 inflated ≫ mean] is tiny).  Production
#: sizing: w ≈ e/ε for additive error εN, d ≈ ln(1/δ).
DEFAULT_W = 2048
DEFAULT_D = 4


def cms_build(
    occurrences: DataFrame, key: Column, w: int = DEFAULT_W, d: int = DEFAULT_D
) -> DataFrame:
    """The sketch as a (depth, bucket, c) DataFrame of ``d*w`` rows.

    One map-side-combinable aggregation over the occurrence stream;
    every executor ships at most ``d*w`` partial counts.
    """
    rows = occurrences.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(w)).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("db")
    )
    return (
        rows.select("db.depth", "db.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    df: DataFrame,
    key: Column,
    cms: DataFrame,
    w: int = DEFAULT_W,
    d: int = DEFAULT_D,
    out: str = "cms_est",
) -> DataFrame:
    """Adds the CMS frequency estimate of ``key`` to every row, as ``d``
    chained broadcast joins + ``least`` — no shuffle, no UDF."""
    est = df.withColumn("__ckey", key)
    for i in range(d):
        c_i = cms.where(F.col("depth") == i).select(
            F.col("bucket").alias(f"__cb{i}"), F.col("c").alias(f"__cc{i}")
        )
        est = est.join(
            F.broadcast(c_i),
            F.pmod(F.xxhash64(F.col("__ckey"), F.lit(i)), F.lit(w))
            == F.col(f"__cb{i}"),
            # left join: an absent bucket means count 0 (possible for a
            # probe key never seen at build time)
            "left",
        ).drop(f"__cb{i}")
    return est.withColumn(
        out,
        F.least(*[F.coalesce(F.col(f"__cc{i}"), F.lit(0)) for i in range(d)]),
    ).drop(*[f"__cc{i}" for i in range(d)], "__ckey")


def heavy_hitters(
    occurrences: DataFrame,
    key: Column,
    threshold: int,
    w: int = DEFAULT_W,
    d: int = DEFAULT_D,
) -> DataFrame:
    """Exact keys with ≥ ``threshold`` occurrences, via CMS prefilter +
    exact confirm (sketch can only over-count → no false negatives →
    output is exact)."""
    from lexam_data_pipeline_spark.operators.caching import persist_slot

    occ = occurrences.select(key.alias("k"))
    cms = persist_slot(cms_build(occ, F.col("k"), w, d), "cms.sketch")
    candidates = cms_estimate(occ, F.col("k"), cms, w, d).where(
        F.col("cms_est") >= threshold
    )
    return (
        candidates.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitter tokens (≥ 0.2% of all occurrences): CMS
    prefilter + exact confirm.  The oracle computes the same set the
    expensive way (full GROUP BY / HAVING) — a hash-match proves the
    sketch path is output-invariant, the same honesty contract as
    q_bloom_decontaminate."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(F.explode(tokens("text")).alias("token")).where(
        F.length("token") > 0
    )
    total = occ.count()  # control-plane scalar, sets the exact threshold
    threshold = max(int(total * 0.002), 2)
    return (
        heavy_hitters(occ, F.col("token"), threshold)
        .select(F.col("k").alias("token"), F.col("n").alias("n_occurrences"))
    )
