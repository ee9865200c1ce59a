"""Serving parity: the questions listing endpoint (SURVEY §3.1; ref
backend/app/main.py:155-220) as one DataFrame program.

Reproduces filter → search → sort → paginate → nest-variants with the
reference's semantics:

* conjunctive IN-list + 3-valued boolean filters (P2/P3, main.py:72-99)
* variant-side filters restrict questions via a semi join (P7/J6)
* case-insensitive substring search on question text OR any variant answer
  (P4 + correlated-EXISTS J4, main.py:102-114)
* dynamic sort column with the stable ``id`` tiebreak (O1, main.py:195-200);
  ``config``/``split`` sort keys are min-per-question scalars (J3/W1,
  main.py:137-148)
* offset/limit pagination, limit capped at 200 (O2, main.py:173-174)
* eager-loaded variants nested per question (J2, main.py:189,554-577) via
  ``collect_list(struct)``.

Scale notes: pagination is a global sort — the reference caps page depth
(limit ≤ 200) and so do we; the sort ships only the page keys, and the
variant nesting join runs on the ≤200 page ids (broadcast), so the deep
work is the filter scan, which pushes down to parquet.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.operators.caching import persist_slot, qopt_enabled
from lexam_data_pipeline_spark.operators.filters import (
    VARIANT_LIST_FIELDS,
    apply_question_filters,
    apply_variant_filters,
    search_predicate,
)

#: columns sortable directly on questions (ref main.py:137-148)
QUESTION_SORT_COLUMNS = ("id", "course", "language", "area", "jurisdiction", "year")
#: variant-derived sort keys: min(config)/min(split) per question (J3)
VARIANT_SORT_COLUMNS = ("config", "split")

MAX_PAGE_LIMIT = 200  # ref main.py:174


@dataclass
class QuestionsPage:
    total: int
    rows: DataFrame  # one row per question, `variants` = array<struct>


def _question_ids_matching(variants: DataFrame, fc: dict) -> DataFrame | None:
    """Distinct question ids having ≥1 variant passing the variant-side
    filters — None when no variant filter is active (P7: the join is only
    introduced when needed, like main.py:75-81)."""
    if not any(fc.get(f) for f in VARIANT_LIST_FIELDS):
        return None
    return apply_variant_filters(variants, fc).select("question_id").distinct()


def filtered_questions(
    questions: DataFrame,
    variants: DataFrame,
    fc: dict | None = None,
    search: str | None = None,
) -> DataFrame:
    """The filtered+searched question set shared by the listing, the facet
    endpoint, and the dashboard."""
    fc = fc or {}
    q = apply_question_filters(questions, fc)
    vmatch = _question_ids_matching(variants, fc)
    if vmatch is not None:
        q = q.join(vmatch.withColumnRenamed("question_id", "id"), "id", "left_semi")
    if search:
        # OR of a local predicate and a correlated EXISTS (J4): express the
        # EXISTS as a marker join so both sides evaluate in one pass.
        answer_match = (
            variants.filter(search_predicate(F.col("answer"), search))
            .select(F.col("question_id").alias("id"))
            .distinct()
            .withColumn("__answer_hit", F.lit(True))
        )
        q = (
            q.join(answer_match, "id", "left_outer")
            .filter(search_predicate(F.col("question"), search) | F.col("__answer_hit").isNotNull())
            .drop("__answer_hit")
        )
    return q


def questions_page(
    questions: DataFrame,
    variants: DataFrame,
    *,
    fc: dict | None = None,
    search: str | None = None,
    sort_by: str = "year",
    sort_dir: str = "desc",
    offset: int = 0,
    limit: int = 50,
) -> QuestionsPage:
    """One page of the questions listing with nested variants."""
    if sort_by not in QUESTION_SORT_COLUMNS + VARIANT_SORT_COLUMNS:
        raise ValueError(f"unsortable column: {sort_by}")
    limit = max(1, min(int(limit), MAX_PAGE_LIMIT))
    offset = max(0, int(offset))

    base = filtered_questions(questions, variants, fc, search)
    # count + page off one cached plan (ref runs the query twice,
    # main.py:193,198 — we pay the scan once).  The persist must OUTLIVE
    # this function: the returned ``rows`` frame is lazy, and the old
    # unpersist-in-finally shape meant the caller's materialization
    # re-derived the whole filter pipeline with the cache already gone —
    # the count was the only job that ever hit it.  ``persist_slot``
    # keeps the cache alive for the rows job and stays bounded (next
    # call through the slot, or release_all, frees it).
    # SINGLE-REQUEST-AT-A-TIME assumption (r11 ADVICE): the one global
    # slot means a subsequent questions_page call evicts the cache an
    # earlier page's still-lazy rows frame depends on.  Correctness is
    # safe (a cache hint recomputes deterministically); only the reuse
    # vanishes.  Key the slot per request id if concurrent serving
    # ever enters scope.
    hold = qopt_enabled()
    base = persist_slot(base, "serving.questions.page_base") if hold else base.persist()
    try:
        total = base.count()

        if sort_by in VARIANT_SORT_COLUMNS:
            # J3: correlated scalar subquery min(config|split) per question
            keys = variants.groupBy("question_id").agg(F.min(sort_by).alias("__sort"))
            sortable = base.join(
                keys.withColumnRenamed("question_id", "id"), "id", "left_outer"
            )
            sort_col = F.col("__sort")
        else:
            sortable = base
            sort_col = F.col(sort_by)
        ordered = sortable.orderBy(
            sort_col.desc_nulls_last() if sort_dir == "desc" else sort_col.asc_nulls_last(),
            F.col("id").asc(),
        )
        page = ordered.offset(offset).limit(limit)

        # J2: nest this page's variants. The page is ≤200 rows → broadcast
        # it into the variants scan instead of shuffling all variants.
        page_variants = variants.join(
            F.broadcast(page.select(F.col("id").alias("question_id"))), "question_id", "inner"
        )
        nested = page_variants.groupBy("question_id").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(  # id first → array_sort orders by variant id
                        "id", "config", "split", "choices", "gold", "answer"
                    )
                )
            ).alias("variants")
        )
        rows = (
            page.join(
                F.broadcast(nested.withColumnRenamed("question_id", "id")), "id", "left_outer"
            )
            .withColumn(
                "variants",
                F.coalesce(F.col("variants"), F.array().cast(nested.schema["variants"].dataType)),
            )
        )
        # the nesting join does not preserve page order; restore it on the
        # same key (variant-derived keys rode along as __sort)
        key = F.col(sort_by) if sort_by in QUESTION_SORT_COLUMNS else F.col("__sort")
        rows = rows.orderBy(
            key.desc_nulls_last() if sort_dir == "desc" else key.asc_nulls_last(),
            F.col("id").asc(),
        )
        if sort_by in VARIANT_SORT_COLUMNS:
            rows = rows.drop("__sort")
        return QuestionsPage(total=total, rows=rows)
    finally:
        if not hold:
            base.unpersist()


def top_courses_for_search(
    questions: DataFrame, variants: DataFrame, search: str, n: int = 10
) -> DataFrame:
    """O3: top-N courses by match count for a search term
    (ref main.py:531-543), deterministic via the course-name tiebreak."""
    base = filtered_questions(questions, variants, None, search)
    return (
        base.groupBy("course")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy(F.desc("n_matches"), F.asc("course"))
        .limit(n)
    )


def get_question(questions: DataFrame, variants: DataFrame, question_id: str) -> DataFrame:
    """Single-question lookup with nested variants (ref
    main.py /api/questions/{id}): point filter + broadcast-nested
    children — the scan prunes to one row before the join."""
    one = questions.filter(F.col("id") == question_id)
    nested = (
        variants.filter(F.col("question_id") == question_id)
        .groupBy("question_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("id", "config", "split", "choices", "gold", "answer"))
            ).alias("variants")
        )
        .withColumnRenamed("question_id", "id")
    )
    return one.join(F.broadcast(nested), "id", "left_outer").withColumn(
        "variants",
        F.coalesce(F.col("variants"), F.array().cast(nested.schema["variants"].dataType)),
    )
