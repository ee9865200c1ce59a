"""As-of join and binned range join (operators/temporal.py).

Registry parity already proves the fixture queries match DuckDB; these
tests pin the operator semantics on hand-built edge cases (exact-time
ties, tiebreaks, no-match left rows, bin-boundary probes) and the plan
shapes that make them 100 TB-safe (no nested-loop/cartesian join, one
shuffle for the as-of window).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.operators.temporal import asof_join, range_join_binned


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_join_semantics(spark):
    left = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),  # after two orders
            (1, _ts("2024-01-01 08:00:00"), "b"),  # exactly at order time
            (1, _ts("2024-01-01 07:59:59"), "c"),  # before every order
            (2, _ts("2024-01-01 12:00:00"), "d"),  # user with no orders
        ],
        "uid long, t timestamp, tag string",
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 08:00:00"), 100, 10.0),
            (1, _ts("2024-01-01 09:00:00"), 200, 20.0),
            (1, _ts("2024-01-01 09:00:00"), 300, 30.0),  # tie → max orderkey
        ],
        "uid long, t timestamp, ok long, price double",
    )
    out = asof_join(
        left,
        right.withColumnRenamed("t", "rt"),
        on="uid",
        left_time="t",
        right_time="rt",
        carry={"ok": "asof_ok", "price": "asof_price"},
        tiebreak="ok",
    )
    got = {r["tag"]: (r["asof_ok"], r["asof_price"]) for r in out.collect()}
    assert got == {
        "a": (300, 30.0),  # latest time wins, tie broken by max ok
        "b": (100, 10.0),  # right_time == left_time is visible
        "c": (None, None),  # nothing at-or-before
        "d": (None, None),  # key with no right rows
    }


def test_asof_join_plan_single_shuffle_no_nested_loop(spark, sf_small):
    from lexam_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, sf_small, "events").withColumnRenamed("user_id", "o_custkey")
    orders = load_table(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        ev, orders, "o_custkey", "ts", "o_orderdate", {"o_orderkey": "asof_ok"}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"as-of should shuffle once, saw {n_exchanges}:\n{plan}"


def test_range_join_binned_boundaries(spark):
    day_us = 24 * 3600 * 1_000_000
    build = _mk(
        spark,
        [(1, 10, _ts("2024-01-02 00:00:00")), (2, 10, _ts("2024-01-05 12:00:00")),
         (3, 99, _ts("2024-01-01 00:00:00"))],
        "bid long, bkey long, start timestamp",
    )
    probe = _mk(
        spark,
        [
            (10, _ts("2024-01-02 00:00:00"), "in-at-start"),
            (10, _ts("2024-01-02 23:59:59"), "in-before-end"),
            (10, _ts("2024-01-03 00:00:00"), "out-at-end"),  # exclusive end
            (10, _ts("2024-01-06 11:59:59"), "in-cross-bin"),  # bin after start's
            (10, _ts("2024-01-01 23:59:59"), "out-before-start"),
        ],
        "pkey long, pt timestamp, tag string",
    )
    out = range_join_binned(
        build, probe, ("bkey", "pkey"), F.col("start"), day_us, "pt"
    ).select("bid", "tag")
    got = {(r["bid"], r["tag"]) for r in out.collect()}
    assert got == {
        (1, "in-at-start"),
        (1, "in-before-end"),
        (2, "in-cross-bin"),
        (3, None),  # no-match build row survives exactly once
    }
    assert out.where(F.col("bid") == 3).count() == 1


def test_range_join_plan_is_equi_join(spark, sf_small):
    from lexam_data_pipeline_spark.catalog import load_table

    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ev = load_table(spark, sf_small, "events").select("user_id", "ts", "event_id")
    out = range_join_binned(
        orders, ev, ("o_custkey", "user_id"), F.col("o_orderdate"),
        7 * 24 * 3600 * 1_000_000, "ts",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # a real equi join operator was chosen
