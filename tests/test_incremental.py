"""Unit tests for operators/incremental.py (aggregate-state maintenance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexam_data_pipeline_spark.operators.incremental import merge_state, partial_state
from lexam_data_pipeline_spark.operators.merge import merge_upsert


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


def test_merge_upsert_hypothesis_dict_semantics(spark):
    """Property: merge_upsert(base, updates, [k]) == {**base_dict,
    **updates_dict} for ANY generated key/value sets (the Python dict
    union IS the MERGE spec)."""
    from hypothesis import given, settings, strategies as st

    kv = st.tuples(st.integers(min_value=0, max_value=15), st.text(max_size=4))

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(st.lists(kv, max_size=20), st.lists(kv, max_size=20))
    def check(base_rows, upd_rows):
        base_d = {k: v for k, v in base_rows}
        upd_d = {k: v for k, v in upd_rows}
        base = spark.createDataFrame(
            list(base_d.items()) or [(None, None)], "k int, v string"
        ).filter(F.col("k").isNotNull())
        upd = spark.createDataFrame(
            list(upd_d.items()) or [(None, None)], "k int, v string"
        ).filter(F.col("k").isNotNull())
        got = {r["k"]: r["v"] for r in merge_upsert(base, upd, ["k"]).collect()}
        assert got == {**base_d, **upd_d}

    check()


def test_incremental_hypothesis_any_batching_equals_full(spark):
    """Property: for ANY dataset and ANY 3-way batching, folding the
    batches in any order through merge_state equals the from-scratch
    aggregate — the q_incremental_agg invariant, generatively."""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.decimals(
            min_value="-999.99", max_value="999.99", places=2, allow_nan=False
        ),
        st.integers(min_value=0, max_value=2),  # batch assignment
    )

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(st.lists(row, min_size=1, max_size=40))
    def check(rows):
        data = spark.createDataFrame(
            [(k, float(v), b) for k, v, b in rows], "k string, v double, b int"
        )
        full = _rows(partial_state(data, ["k"], "v"))
        batches = [data.filter(F.col("b") == i) for i in range(3)]
        state = partial_state(batches[2], ["k"], "v")
        for nxt in (batches[0], batches[1]):
            state = merge_state(state, partial_state(nxt, ["k"], "v"), ["k"])
        # empty batches merge as no-ops; group set must match exactly
        assert _rows(state) == full

    check()


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
