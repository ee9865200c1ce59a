"""Ingest operator tests (SURVEY §2.1 S1-S4, S9, ST3) against the
reference's seed semantics (backend/app/seed.py)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from lexam_data_pipeline_spark.ingest import (
    add_missing_columns,
    derive_international,
    derive_year,
    first_config_wins,
    parse_choices,
    seed_guard,
    union_configs,
)
from lexam_data_pipeline_spark.model import QUESTIONS_SCHEMA


def test_parse_choices(spark):
    df = spark.createDataFrame(
        [
            ("['Alpha', 'Beta', 'Gamma']",),
            ('["x", "y"]',),
            (None,),
            ("not a list",),
        ],
        "raw string",
    )
    got = [r[0] for r in df.select(parse_choices(F.col("raw"))).collect()]
    assert got[0] == ["Alpha", "Beta", "Gamma"]
    assert got[1] == ["x", "y"]
    assert got[2] is None
    assert got[3] is None  # unparseable → NULL, like a failed literal_eval


def test_derive_year(spark):
    df = spark.createDataFrame(
        [("2021-HS",), ("1999",), (None,), ("bad",)], "raw string"
    )
    got = [r[0] for r in df.select(derive_year(F.col("raw"))).collect()]
    assert got == [2021, 1999, None, None]
    # integer input passes through the string cast unchanged
    df2 = spark.createDataFrame([(2020,)], "raw int")
    assert df2.select(derive_year(F.col("raw"))).collect()[0][0] == 2020


def test_derive_international(spark):
    intl = frozenset({"Public International Law", "International Arbitration"})
    df = spark.createDataFrame(
        [("Public International Law",), ("Contract Law",)], "course string"
    )
    got = [r[0] for r in df.select(derive_international(F.col("course"), intl)).collect()]
    assert got == [True, False]


def test_union_configs_and_first_wins(spark):
    # q1 appears in two configs; mcq_4_choices precedes open_question in
    # CONFIGS order, so its metadata wins (ref seed.py: first insert wins)
    mcq = spark.createDataFrame(
        [Row(id="q1", course="From MCQ"), Row(id="q2", course="Only MCQ")]
    )
    open_q = spark.createDataFrame(
        [Row(id="q1", course="From Open"), Row(id="q3", course="Only Open")]
    )
    unioned = union_configs({"mcq_4_choices": mcq, "open_question": open_q})
    assert unioned.count() == 4
    dedup = first_config_wins(
        unioned.withColumnRenamed("config", "_source_config")
    )
    by = {r["id"]: r["course"] for r in dedup.collect()}
    assert by == {"q1": "From MCQ", "q2": "Only MCQ", "q3": "Only Open"}


def test_add_missing_columns(spark):
    partial = spark.createDataFrame(
        [("q1", "text?", "C", "de", "Private", "Swiss")],
        "id string, question string, course string, language string, area string, jurisdiction string",
    )
    full = add_missing_columns(partial, QUESTIONS_SCHEMA)
    assert [f.name for f in full.schema.fields] == [f.name for f in QUESTIONS_SCHEMA.fields]
    row = full.collect()[0]
    assert row["year"] is None and row["international"] is None


def test_seed_guard(spark):
    assert seed_guard(None, "mcq_4_choices") is True
    existing = spark.createDataFrame([Row(id=1, config="mcq_4_choices")])
    assert seed_guard(existing, "mcq_4_choices") is False
    assert seed_guard(existing, "open_question") is True
