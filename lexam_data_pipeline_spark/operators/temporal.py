"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval-overlap) join.

Both are expressed as compositions of shuffle-friendly DataFrame ops —
no per-key cartesian products, no driver loops — so the plans survive a
1000-executor 100 TB run:

* **As-of join** uses the union + ordered-window carry-forward shape:
  tag both sides, union on the join key, sort each key's timeline once,
  and let ``last(..., ignorenulls=True)`` carry the most recent
  right-side attributes onto each left row.  ONE shuffle (by key), no
  range predicate ever reaches a join operator, and skew behaves like
  any windowed aggregation.  This is the standard scalable as-of plan
  (kdb's ``aj`` / pandas ``merge_asof`` semantics, flink temporal join).

* **Range join** uses bin blocking: bucket the probe side's timestamps
  into fixed-width bins, replicate each build-side interval onto the
  (at most ``ceil(len/bin) + 1``) bins it overlaps, equi-join on
  ``(key, bin)``, then apply the exact range predicate.  With the bin
  width equal to the interval length each interval lands on ≤ 2 bins,
  so the join is a plain equi shuffle join with ≤ 2× build-side
  replication — never the O(n·m)-per-key BroadcastNestedLoop Spark
  would pick for a raw inequality join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    carry: dict[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` sharing the join key ``on`` (ties on
    ``right_time`` broken by the greatest ``tiebreak`` value).

    ``carry`` maps right-side column → output alias.  Left rows with no
    prior right row keep NULLs (left-outer as-of semantics).

    Plan shape: union both sides on the key, one window sorted by
    ``(time, side, tiebreak)`` per key, carry-forward via
    ``last(ignorenulls=True)``, filter back to left rows.  One shuffle
    total; at 100 TB this is a single repartition-by-key plus a sort —
    the same cost as any groupBy over the union.
    """
    # NTZ columns coerce exactly under the engine-pinned UTC session
    # (catalog.load_table); the cast makes union sides type-identical.
    l_cols = [F.col(c) for c in left.columns]
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carry],
        *l_cols,
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias("__tie"),
        *[F.col(c).alias(f"__r_{c}") for c in carry],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    # Right rows sort BEFORE left rows at equal time (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row — the
    # conventional `right_time <= left_time` as-of inclusion.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs)
    for c, alias in carry.items():
        carried = carried.withColumn(
            alias, F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return carried.where(F.col("__side") == 1).select(
        *left.columns, *[F.col(a) for a in carry.values()]
    )


def range_join_binned(
    build: DataFrame,
    probe: DataFrame,
    on: tuple[str, str],
    interval_start: Column,
    interval_len_us: int,
    probe_time: str,
    how: str = "left",
) -> DataFrame:
    """Left range join: every ``build`` row joined to the ``probe`` rows
    whose ``probe_time`` falls in ``[interval_start, interval_start +
    interval_len_us)`` with matching key; build rows with no match
    survive with NULL probe columns.

    Bin width == interval length, so each build interval is exploded to
    exactly the 1–2 bins it overlaps and each probe row maps to its one
    bin: the inequality becomes an equi-join on ``(key, bin)`` plus a
    residual filter — shuffle-partitionable, skew-salvageable, and
    AQE-plannable, unlike a raw theta join.
    """
    build_key, probe_key = on
    overlap = set(build.columns) & set(probe.columns)
    if overlap:
        raise ValueError(f"build/probe column names must be disjoint: {sorted(overlap)}")
    base = build.withColumn(
        "__start_us", F.unix_micros(interval_start.cast("timestamp"))
    ).withColumn("__id", F.monotonically_increasing_id())
    b = base.withColumn(
        "__bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("__start_us") / interval_len_us),
                    F.floor(
                        (F.col("__start_us") + interval_len_us - 1) / interval_len_us
                    ),
                )
            )
        ),
    )
    p = probe.withColumn("__p_us", F.unix_micros(F.col(probe_time).cast("timestamp"))).withColumn(
        "__bin", F.floor(F.col("__p_us") / interval_len_us)
    )
    cond = (
        (F.col(f"b.{build_key}") == F.col(f"p.{probe_key}"))
        & (F.col("b.__bin") == F.col("p.__bin"))
        & (F.col("p.__p_us") >= F.col("b.__start_us"))
        & (F.col("p.__p_us") < F.col("b.__start_us") + interval_len_us)
    )
    matched = b.alias("b").join(p.alias("p"), cond, "inner").select(
        F.col("b.__id").alias("__id"),
        *[F.col(f"b.{c}") for c in build.columns],
        *[F.col(f"p.{c}").alias(c) for c in probe.columns],
    )
    if how == "inner":
        return matched.drop("__id")
    # Left completion: which build rows matched can only be known across
    # ALL their exploded bins (a 2-bin interval may match in either), so
    # restore no-match rows via an anti-join on the build-row id — the
    # anti side shuffles only ids + build columns, never probe payloads.
    # The persist slot stops the union's two consumers from running the
    # bin join twice (spillable cache; a caller that aggregates anyway
    # should prefer how="inner" + aggregate-side completion instead —
    # see plans.fixture_queries.q_range_join_events).
    from lexam_data_pipeline_spark.operators.caching import persist_slot

    matched = persist_slot(matched, "range_join_binned.matched")
    unmatched = base.join(
        matched.select("__id").distinct(), "__id", "left_anti"
    ).select(
        *build.columns,
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe.columns],
    )
    return matched.drop("__id").unionByName(unmatched)
