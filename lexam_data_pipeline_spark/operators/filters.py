"""Filter operators (SURVEY §2.2): conjunctive IN-lists, 3-valued boolean
equality, case-insensitive search.

Single source of truth for the filter semantics the reference duplicates
in three places (`backend/app/main.py:72-114`,
`backend/app/services/generation.py:40-63,150-172`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: question-side fields accepted by filter configs (ref main.py:72-99)
QUESTION_LIST_FIELDS = ("area", "language", "course", "jurisdiction", "year")
#: variant-side fields
VARIANT_LIST_FIELDS = ("config", "split")
#: 3-valued boolean fields: compared only when the filter value is not None
BOOL_FIELDS = ("international", "negative_question", "none_as_an_option")


def apply_question_filters(questions: DataFrame, fc: dict) -> DataFrame:
    """IN-list + nullable-boolean conjuncts on the questions table.

    NULL booleans drop out of ``col == True`` and ``col == False`` alike —
    the reference's 3-valued semantics (P3, ref main.py:93-97)."""
    out = questions
    for field in QUESTION_LIST_FIELDS:
        vals = fc.get(field)
        if vals:
            out = out.filter(F.col(field).isin(*vals))
    for field in BOOL_FIELDS:
        val = fc.get(field)
        if val is not None:
            out = out.filter(F.col(field) == F.lit(bool(val)))
    return out


def apply_variant_filters(variants: DataFrame, fc: dict) -> DataFrame:
    out = variants
    for field in VARIANT_LIST_FIELDS:
        vals = fc.get(field)
        if vals:
            out = out.filter(F.col(field).isin(*vals))
    return out


def filtered_variants(variants: DataFrame, questions: DataFrame, fc: dict) -> DataFrame:
    """The experiment's working set: variants ⋈ questions under the
    experiment filter config (ref services/generation.py:40-63).

    The join is introduced unconditionally — Catalyst prunes the question
    side to the filter columns, and the dimension side is broadcast, so
    the conditional-join-construction trick of the reference (P7,
    main.py:75-81) is unnecessary here."""
    fc = fc or {}
    v = apply_variant_filters(variants, fc)
    q = apply_question_filters(questions, fc)
    return v.join(
        F.broadcast(q.withColumnRenamed("id", "question_id")),
        "question_id",
        "inner",
    )


def search_predicate(text_col: Column, term: str) -> Column:
    """Case-insensitive substring (P4/F1, ref main.py:102-114 ILIKE)."""
    return F.lower(text_col).contains(term.lower())
