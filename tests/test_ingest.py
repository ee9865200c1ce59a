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


def _write_hf_save_to_disk(path, table):
    """Emulate Dataset.save_to_disk: Arrow IPC stream file + state.json."""
    import json
    import os

    import pyarrow as pa

    os.makedirs(path)
    fname = "data-00000-of-00001.arrow"
    with pa.ipc.new_stream(os.path.join(path, fname), table.schema) as w:
        w.write_table(table)
    with open(os.path.join(path, "state.json"), "w") as fh:
        json.dump({"_data_files": [{"filename": fname}]}, fh)


def test_hf_adapter_save_to_disk_layout(spark, tmp_path):
    """S1: seed from a local HF save_to_disk dump through union_configs —
    closes the reference's load_dataset gap (seed.py:75-83) without
    requiring the datasets package."""
    import pyarrow as pa

    from lexam_data_pipeline_spark.sources import load_hf_dataset, seed_configs_from_hf

    mcq = pa.table({"id": ["q1", "q2"], "course": ["From MCQ", "Only MCQ"]})
    open_q = pa.table({"id": ["q1", "q3"], "course": ["From Open", "Only Open"]})
    _write_hf_save_to_disk(str(tmp_path / "mcq_4_choices"), mcq)
    _write_hf_save_to_disk(str(tmp_path / "open_question"), open_q)

    loaded = load_hf_dataset(spark, str(tmp_path / "mcq_4_choices"))
    assert loaded.count() == 2
    assert set(loaded.columns) == {"id", "course"}

    per_config = seed_configs_from_hf(
        spark, str(tmp_path), ["mcq_4_choices", "open_question"]
    )
    unioned = union_configs(per_config)
    dedup = first_config_wins(unioned.withColumnRenamed("config", "_source_config"))
    by = {r["id"]: r["course"] for r in dedup.collect()}
    assert by == {"q1": "From MCQ", "q2": "Only MCQ", "q3": "Only Open"}


def test_hf_adapter_split_and_parquet_layouts(spark, tmp_path):
    """DatasetDict-style split subdir and parquet-export fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lexam_data_pipeline_spark.sources import load_hf_dataset

    # split subdirectory (DatasetDict layout): root/test/state.json
    _write_hf_save_to_disk(
        str(tmp_path / "dd" / "test"), pa.table({"id": ["a", "b"], "n": [1, 2]})
    )
    df = load_hf_dataset(spark, str(tmp_path / "dd"), split="test")
    assert df.count() == 2

    # parquet export (no state.json)
    import os

    os.makedirs(str(tmp_path / "pq"))
    pq.write_table(
        pa.table({"id": ["x"], "n": [9]}), str(tmp_path / "pq" / "part-0.parquet")
    )
    df2 = load_hf_dataset(spark, str(tmp_path / "pq"))
    assert df2.collect()[0]["id"] == "x"

    # hub id without datasets package -> clear error
    import pytest as _pytest

    from lexam_data_pipeline_spark.sources.huggingface import load_hf_dataset as lhd

    with _pytest.raises(ValueError, match="datasets"):
        lhd(spark, "LEXam-Benchmark/LEXam")
