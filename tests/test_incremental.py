"""Unit tests for operators/incremental.py (aggregate-state maintenance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.operators.incremental import merge_state, partial_state


def _rows(df):
    return {
        r["k"]: (r["n"], float(r["sum_dec"])) for r in df.collect()
    }


def test_merge_matches_from_scratch_and_is_batch_order_independent(spark):
    data = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 10.0), ("c", 0.25), ("a", 4.0)],
        "k string, v double",
    )
    full = _rows(partial_state(data, ["k"], "v"))
    b1 = data.filter(F.col("v") < 3)
    b2 = data.filter(F.col("v") >= 3)
    s12 = merge_state(partial_state(b1, ["k"], "v"), partial_state(b2, ["k"], "v"), ["k"])
    s21 = merge_state(partial_state(b2, ["k"], "v"), partial_state(b1, ["k"], "v"), ["k"])
    assert _rows(s12) == full
    assert _rows(s21) == full


def test_merge_handles_new_and_absent_groups(spark):
    base = spark.createDataFrame([("a", 1.0)], "k string, v double")
    batch = spark.createDataFrame([("b", 2.0)], "k string, v double")
    out = _rows(
        merge_state(
            partial_state(base, ["k"], "v"),
            partial_state(batch, ["k"], "v"),
            ["k"],
        )
    )
    assert out == {"a": (1, 1.0), "b": (1, 2.0)}


def test_merge_null_group_key(spark):
    """eqNullSafe join: a NULL group key must merge with itself, not
    cross-join or drop."""
    base = spark.createDataFrame([(None, 1.0), ("a", 1.0)], "k string, v double")
    batch = spark.createDataFrame([(None, 2.0)], "k string, v double")
    out = _rows(
        merge_state(
            partial_state(base, ["k"], "v"),
            partial_state(batch, ["k"], "v"),
            ["k"],
        )
    )
    assert out == {None: (2, 3.0), "a": (1, 1.0)}
