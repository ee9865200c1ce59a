"""Unit tests for operators/quality.py (declarative data-quality audit)."""

from __future__ import annotations

from lexam_data_pipeline_spark.operators.quality import (
    InSet,
    NotNull,
    Range,
    RefIntegrity,
    Unique,
    audit,
)


def _counts(df) -> dict:
    return {r["check"]: r["n_violations"] for r in df.collect()}


def test_clean_table_audits_zero(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.5)], "k int, tag string, v double"
    )
    out = _counts(
        audit(df, [NotNull("k"), InSet("tag", ("a", "b")), Range("v", 0, 10), Unique(("k",))])
    )
    assert out == {
        "not_null:k": 0,
        "in_set:tag": 0,
        "range:v": 0,
        "unique:k": 0,
    }


def test_each_violation_class_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (1, "z", -1.0),   # dup key, bad domain, below range
            (None, None, 99.0),  # null key; null tag is NOT a domain violation
        ],
        "k int, tag string, v double",
    )
    out = _counts(
        audit(df, [NotNull("k"), InSet("tag", ("a", "b")), Range("v", 0, 10), Unique(("k",))])
    )
    assert out["not_null:k"] == 1
    assert out["in_set:tag"] == 1  # 'z' only; NULL exempt
    assert out["range:v"] == 2  # -1 below lo, 99 above hi
    assert out["unique:k"] == 2  # both rows of the duplicated group


def test_ref_integrity_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (3,), (3,)], "fk int")
    parent = spark.createDataFrame([(1,), (9,)], "pk int")
    out = _counts(audit(child, [RefIntegrity("fk", parent, "pk")]))
    assert out == {"ref:fk->pk": 3}  # 2 and both 3s


def test_row_local_checks_share_one_scan(spark):
    """k row-local checks must compile to a single aggregate pass —
    one FileScan-free local plan with exactly one Aggregate pair."""
    df = spark.createDataFrame([(1, "a", 1.0)], "k int, tag string, v double")
    plan = (
        audit(df, [NotNull("k"), InSet("tag", ("a",)), Range("v", 0, 1)])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Aggregate") == 1, plan
