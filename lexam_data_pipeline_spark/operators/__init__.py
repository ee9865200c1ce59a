"""Relational + scale operators: filter-config semantics, skew handling,
exact/approx aggregate switches."""

from lexam_data_pipeline_spark.operators.approx import distinct_count, percentile_agg
from lexam_data_pipeline_spark.operators.filters import (
    apply_question_filters,
    apply_variant_filters,
    filtered_variants,
    search_predicate,
)
from lexam_data_pipeline_spark.operators.skew import salted_count, salted_join, with_salt

__all__ = [
    "apply_question_filters",
    "apply_variant_filters",
    "distinct_count",
    "filtered_variants",
    "percentile_agg",
    "salted_count",
    "salted_join",
    "search_predicate",
    "with_salt",
]
