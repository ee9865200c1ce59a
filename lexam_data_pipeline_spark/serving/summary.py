"""Serving parity: the remaining summary endpoints.

* ``corpus_stats`` — /api/stats (ref main.py:223-245): global totals plus
  by-config/area/language/year counts.
* ``search_summary`` — /api/search-summary (ref main.py:498-552):
  filtered+searched totals with by-area/by-language maps and the top-10
  courses by match count.
* ``judge_summary`` — /{id}/judge-summary (ref judging.py:111-132):
  per-judge judgment count (INCLUDING score-less rows — unlike
  compare-judges) and avg over the scored ones.
* ``question_count`` — /{id}/question-count (ref experiments.py:165-177):
  the variant count an experiment's filter config would select —
  the pre-generation cost preview.

All single-pass aggregates off one filtered base; the reference runs one
query per map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.operators.filters import filtered_variants
from lexam_data_pipeline_spark.serving.questions import filtered_questions


def corpus_stats(questions: DataFrame, variants: DataFrame) -> dict[str, DataFrame]:
    return {
        "totals": questions.agg(F.count(F.lit(1)).alias("total_questions")).crossJoin(
            variants.agg(F.count(F.lit(1)).alias("total_variants"))
        ),
        "by_config": variants.groupBy("config").agg(F.count(F.lit(1)).alias("count")),
        "by_area": questions.groupBy("area").agg(F.count(F.lit(1)).alias("count")),
        "by_language": questions.groupBy("language").agg(F.count(F.lit(1)).alias("count")),
        "by_year": questions.groupBy("year")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("year"),
    }


def search_summary(
    questions: DataFrame,
    variants: DataFrame,
    search: str,
    fc: dict | None = None,
) -> dict[str, DataFrame]:
    # no persist: the filtered set is unbounded at corpus scale, and each
    # aggregate's scan pushes the filter down anyway (4 pruned scans beat
    # an unbounded cache; callers wanting reuse persist explicitly)
    base = filtered_questions(questions, variants, fc, search)
    return {
        "total": base.agg(F.count(F.lit(1)).alias("total")),
        "by_area": base.groupBy("area").agg(F.count(F.lit(1)).alias("count")),
        "by_language": base.groupBy("language").agg(F.count(F.lit(1)).alias("count")),
        # top-10 courses desc; course-name tiebreak for determinism (the
        # reference relies on DB order)
        "by_course": base.groupBy("course")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("course"))
        .limit(10),
    }


def judge_summary(answers: DataFrame, judgments: DataFrame, experiment_id: int) -> DataFrame:
    exp_answers = answers.filter(F.col("experiment_id") == experiment_id).select(
        F.col("id").alias("answer_id")
    )
    return (
        judgments.join(exp_answers, "answer_id", "left_semi")
        .groupBy("judge_model")
        .agg(
            F.count(F.lit(1)).alias("count"),  # score-less rows included
            F.round(F.avg("score"), 4).alias("avg_score"),  # avg skips NULLs
        )
        .orderBy("judge_model")
    )


def question_count(variants: DataFrame, questions: DataFrame, fc: dict | None) -> int:
    """Pre-generation preview: how many variants the filter selects."""
    return filtered_variants(variants, questions, fc or {}).count()
