"""LLM-as-judge pipeline (SURVEY §2.10 UD3; ref
backend/app/services/judging.py:20-119).

Shape: open-question answers only → anti-join already-judged (J5) →
think-strip (F6) → judge prompt (F9) → LLM map (UD1) → score extraction +
clamp (F5) → new judgment rows for an append sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.functions.extract import (
    extract_score,
    strip_thinking,
    template_format,
)
from lexam_data_pipeline_spark.model import (
    DEFAULT_JUDGE_MAX_TOKENS,
    DEFAULT_JUDGE_TEMPERATURE,
)
from lexam_data_pipeline_spark.pipeline.llm import llm_map


def judgment_id(answer_id: F.Column, judge_model: str) -> F.Column:
    return F.xxhash64(F.lit("judgment"), answer_id.cast("long"), F.lit(judge_model))


def run_judging(
    experiment: dict,
    answers: DataFrame,
    variants: DataFrame,
    questions: DataFrame,
    judge_model: str,
    *,
    client_spec: dict,
    existing_judgments: DataFrame | None = None,
    completed_acc=None,
    failed_acc=None,
    parallelism: int | None = None,
) -> DataFrame:
    """Produce the new judgment rows for (experiment, judge_model).

    Only open-question answers are judged (MCQ is scored by letter match,
    ref judging.py:30-39); answers this judge already scored are skipped
    via anti-join (ref judging.py:42-52) — idempotent re-run."""
    exp_id = int(experiment["id"])
    jt = experiment.get("judge_temperature")
    jt = DEFAULT_JUDGE_TEMPERATURE if jt is None else float(jt)
    jmax = int(experiment.get("judge_max_tokens") or DEFAULT_JUDGE_MAX_TOKENS)

    open_variants = variants.filter(F.col("config") == "open_question").select(
        F.col("id").alias("variant_id"), "question_id", F.col("answer").alias("ref_answer")
    )
    work = (
        answers.filter(F.col("experiment_id") == exp_id)
        # errored answers don't exist in the reference (failed generation
        # calls roll back) — never judge them
        .filter(F.col("error").isNull())
        .select(
            F.col("id").alias("answer_id"),
            "variant_id",
            "answer_text",
        )
        .join(open_variants, "variant_id", "inner")
        .join(
            F.broadcast(
                questions.select(F.col("id").alias("question_id"), F.col("question"))
            ),
            "question_id",
            "inner",
        )
    )
    if existing_judgments is not None:
        # errored judgments don't count as done (mirrors run_generation's
        # resume rule); sink owners purge them before appending retries
        done = (
            existing_judgments.filter(F.col("judge_model") == judge_model)
            .filter(F.col("error").isNull())
            .select("answer_id")
        )
        work = work.join(done, "answer_id", "left_anti")

    clean_answer = strip_thinking(F.col("answer_text"))
    clean_answer = F.when(
        clean_answer.isNull() | (clean_answer == ""), F.lit("(no answer)")
    ).otherwise(clean_answer)
    prompt = template_format(
        experiment["judge_prompt"],
        {
            "question_fact": F.col("question"),
            "ref_answer": F.coalesce(F.col("ref_answer"), F.lit("(no reference answer)")),
            "model_answer": clean_answer,
        },
    )
    work = work.withColumn("prompt", prompt)
    system_prompt = experiment.get("judge_system_prompt")
    if system_prompt:
        work = work.withColumn("system_prompt", F.lit(system_prompt))
    if parallelism:
        work = work.repartition(parallelism)

    called = llm_map(
        work,
        client_spec=client_spec,
        model=judge_model,
        temperature=jt,
        max_tokens=jmax,
        system_col="system_prompt" if system_prompt else None,
        completed_acc=completed_acc,
        failed_acc=failed_acc,
    )
    clean_judgment = strip_thinking(F.col("content"))
    return called.select(
        judgment_id(F.col("answer_id"), judge_model).alias("id"),
        "answer_id",
        F.lit(judge_model).alias("judge_model"),
        F.col("content").alias("judgment_text"),
        F.when(F.col("error").isNull(), extract_score(clean_judgment)).alias("score"),
        "input_tokens",
        "output_tokens",
        "error",
        F.current_timestamp().alias("created_at"),
    )
