"""Robust statistics operators: MAD outlier detection, winsorized means.

Extends the reference's stats tier (mean/median/min/max only — ref
main.py:431-441, experiment_stats.py:51-61) with the outlier-resistant
estimators a data-quality pipeline needs at corpus scale: flagging price
anomalies, clipping heavy-tailed quality scores before averaging.

Engine-exactness: values enter as integer cents (``round(x*100)`` —
same convention as q_agg_stats); medians/quantiles are exact linear
interpolation over those integers (bit-equal across engines); winsorized
values are floor-scaled back to integers before summation so aggregation
order cannot perturb totals.

100 TB notes: exact ``percentile`` needs the group's values materialized
at one reducer — the groups here are few and the map-side projection is
2 columns, so the shuffle is narrow.  The documented scale switch is
``approx_percentile`` (mergeable GK sketches, operators/approx.py) which
drops the materialization entirely; MAD then becomes approx-MAD with the
same two-pass shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


def mad_outliers(df: DataFrame, group: str, value: str, k: float = 3.0) -> DataFrame:
    """Per-group robust outlier count: |x - median| > k * MAD.

    ONE shuffle total: both exact percentiles run as window aggregates
    over ``partitionBy(group)`` (unbounded frame → computed once per
    group, O(n) scan), and the final ``groupBy(group)`` reuses the same
    hash partitioning so Catalyst elides its exchange.  The earlier
    aggregate→broadcast-join→aggregate→join→aggregate form shuffled the
    fact rows three times for identical results (measured 1.9× slower
    at sf0.1).  Exact per-group percentiles inherently materialize each
    group at one reducer; the documented 100 TB switch is
    ``approx_percentile`` (mergeable sketches, operators/approx.py).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("g")
    flagged = (
        df.select(F.col(group).alias("g"), _cents(value).alias("v"))
        .withColumn("med", F.expr("percentile(v, 0.5D)").over(w))
        .withColumn("dev", F.abs(F.col("v") - F.col("med")))
        .withColumn("mad", F.expr("percentile(dev, 0.5D)").over(w))
    )
    return flagged.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
        # med/mad are group constants; first() under groupBy(g) is
        # deterministic here and keeps the grouping key narrow
        F.round(F.first("med") / 100, 2).alias("median_value"),
        F.round(F.first("mad") / 100, 2).alias("mad_value"),
    )


def mad_outliers_approx(
    df: DataFrame,
    group: str,
    value: str,
    k: float = 3.0,
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB switch for :func:`mad_outliers`: approx percentiles.

    Same output schema and semantics (|x - median| > k * MAD per group),
    but both medians come from ``percentile_approx`` — mergeable
    Greenwald-Khanna summaries, so the heavy level is a map-side partial
    and NO reducer ever materializes a group: memory per task is
    O(accuracy), independent of group size.  That removes the one
    straggler risk the exact plan has (a hot group lands on one reducer,
    SCALE.md's worst 10× ratio).

    Plan: two narrow groupBy shuffles of ``(group, int64)`` + two
    broadcast joins of the tiny per-group stats (|groups| rows).
    Rank error ≤ 1/accuracy; with integer-cents inputs and group sizes
    below ``accuracy`` the GK summary is EXACT, which is what the
    rows-only fixture's pytest bound exploits (tests/test_scale_operators.py
    asserts equality to :func:`mad_outliers` at fixture scale and a
    bounded deviation at coarse accuracy).
    """
    vals = df.select(F.col(group).alias("g"), _cents(value).alias("v"))
    med = vals.groupBy("g").agg(
        F.percentile_approx("v", F.lit(0.5), F.lit(accuracy)).alias("med")
    )
    dev = vals.join(F.broadcast(med), "g").withColumn(
        "dev", F.abs(F.col("v") - F.col("med"))
    )
    mad = dev.groupBy("g").agg(
        F.percentile_approx("dev", F.lit(0.5), F.lit(accuracy)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.round(F.first("med") / 100, 2).alias("median_value"),
            F.round(F.first("mad") / 100, 2).alias("mad_value"),
        )
    )


def winsorized_mean(
    df: DataFrame, group: str, value: str, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Per-group winsorized mean: clamp to [p_lo, p_hi] then average.

    The clamped value is a double (quantile interpolation), floor-scaled
    ×100 to int64 before summing — order-independent, oracle-exact.

    One shuffle: the quantile pair runs as a window aggregate over
    ``partitionBy(group)`` and the final groupBy reuses that
    partitioning (same plan shape as :func:`mad_outliers`).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("g")
    clamped = (
        df.select(F.col(group).alias("g"), _cents(value).alias("v"))
        .withColumn("p", F.expr(f"percentile(v, array({lo}D, {hi}D))").over(w))
        .select(
            "g",
            F.floor(
                F.least(
                    F.greatest(F.col("v").cast("double"), F.element_at("p", 1)),
                    F.element_at("p", 2),
                )
                * F.lit(100.0)
            ).cast("bigint").alias("cv"),
        )
    )
    return clamped.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # cents*100 scale → /10000 back to currency units
        F.round((F.sum("cv") / F.count(F.lit(1))) / F.lit(10000.0), 4).alias(
            "winsorized_mean"
        ),
    )
