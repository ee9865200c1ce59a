"""Scalar expression library: extraction cascade, templates, text/token
expressions — all JVM-side."""

from lexam_data_pipeline_spark.functions.extract import (
    extract_letter,
    extract_score,
    format_choices,
    gold_choice,
    gold_to_letter,
    mcq_correct,
    score_status,
    strip_thinking,
    template_format,
)
from lexam_data_pipeline_spark.functions.text import (
    shingle_set,
    shingles,
    tokens,
    word_count,
)

__all__ = [
    "extract_letter",
    "extract_score",
    "format_choices",
    "gold_choice",
    "gold_to_letter",
    "mcq_correct",
    "score_status",
    "shingle_set",
    "shingles",
    "strip_thinking",
    "template_format",
    "tokens",
    "word_count",
]
