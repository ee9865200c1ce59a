"""Deterministic LEXam-shaped fixture data (FIXTURES.md Part B).

Small enough to hand-verify, distributed enough to exercise the edge
cases the serving layer needs: 3-valued booleans (P3), multi-variant
questions (J2/J3), both splits, all five configs, de/en languages,
open-question answers with spread word counts, and answers/judgments with
NULL letters/scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lexam_data_pipeline_spark.model import (
    ANSWERS_SCHEMA,
    JUDGMENTS_SCHEMA,
    QUESTIONS_SCHEMA,
    VARIANTS_SCHEMA,
)

QUESTIONS = [
    # id, question, course, language, area, jurisdiction, year, n_statements,
    # none_as_an_option, negative_question, international
    ("q1", "Was ist ein Vertrag?", "Contract Law", "de", "Private", "Swiss", 2020, 4, True, False, False),
    ("q2", "Define tort liability standards", "Tort Law", "en", "Private", "Swiss", 2021, None, None, True, False),
    ("q3", "Strafrecht Grundlagen der Schuld", "Criminal Law", "de", "Criminal", "Swiss", 2019, 4, False, None, False),
    ("q4", "International treaty interpretation rules", "Public International Law", "en", "Public", "International", 2022, None, None, None, True),
    ("q5", "Verwaltungsrecht und Ermessen", "Administrative Law", "de", "Public", "Swiss", 2021, 8, True, True, False),
    ("q6", "Comparative constitutional review essay", "Public International Law", "en", "Public", "Generic", 2023, None, False, False, True),
]

VARIANTS = [
    # id, question_id, config, split, choices, gold, answer
    (1, "q1", "mcq_4_choices", "dev", ["A w", "B x", "C y", "D z"], 2, None),
    (2, "q1", "open_question", "dev", None, None, "one two three four five six seven"),
    (3, "q2", "mcq_4_choices", "test", ["p", "q", "r", "s"], 0, None),
    (4, "q2", "mcq_8_choices", "test", ["a", "b", "c", "d", "e", "f", "g", "h"], 5, None),
    (5, "q3", "open_question", "test", None, None, " ".join(["w"] * 60)),
    (6, "q4", "open_question", "test", None, None, " ".join(["x"] * 150)),
    (7, "q4", "mcq_4_choices", "dev", ["t", "u", "v", "w"], 3, None),
    (8, "q5", "mcq_16_choices", "dev", [f"c{i}" for i in range(16)], 7, None),
    (9, "q6", "open_question", "dev", None, None, " ".join(["y"] * 450)),
    (10, "q6", "mcq_32_choices", "test", [f"o{i}" for i in range(32)], 31, None),
]

ANSWERS = [
    # id, experiment_id, variant_id, run_index, model_name, answer_text,
    # extracted_letter, mcq_correct, input_tokens, output_tokens, error, created_at
    (101, 1, 1, 0, "m1", "###C###", "C", True, 10, 5, None, None),
    (102, 1, 1, 1, "m1", "###A###", "A", False, 10, 5, None, None),
    (103, 1, 3, 0, "m1", "Answer: A", "A", True, 12, 6, None, None),
    (104, 1, 3, 1, "m1", "Answer: A", "A", True, 12, 6, None, None),
    (105, 1, 2, 0, "m1", "an open answer", None, None, 20, 30, None, None),
    (106, 1, 5, 0, "m1", "another open answer", None, None, 25, 40, None, None),
    (107, 1, 6, 0, "m1", "a third open answer", None, None, 30, 50, None, None),
    (108, 1, 7, 0, "m1", "no letter found here", None, None, 8, 4, None, None),
    (109, 2, 1, 0, "m2", "###B###", "B", False, 9, 3, None, None),
]

JUDGMENTS = [
    # id, answer_id, judge_model, judgment_text, score, input_tokens,
    # output_tokens, error, created_at
    (201, 105, "j1", "[[0.8]]", 0.8, 50, 10, None, None),
    (202, 106, "j1", "[[0.5]]", 0.5, 55, 12, None, None),
    (203, 107, "j1", "[[1.0]]", 1.0, 60, 14, None, None),
    (204, 105, "j2", "[[0.6]]", 0.6, 52, 11, None, None),
    (205, 106, "j2", "no score", None, 54, 13, None, None),
    (206, 108, "j1", "[[0.9]]", 0.9, 40, 9, None, None),  # open-by-letter answer
]


def lexam_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "questions": spark.createDataFrame(QUESTIONS, QUESTIONS_SCHEMA),
        "variants": spark.createDataFrame(VARIANTS, VARIANTS_SCHEMA),
        "answers": spark.createDataFrame(ANSWERS, ANSWERS_SCHEMA),
        "judgments": spark.createDataFrame(JUDGMENTS, JUDGMENTS_SCHEMA),
    }
