"""Answer-generation pipeline (SURVEY §2.10 UD2; ref
backend/app/services/generation.py:66-141).

The reference's per-variant thread loop becomes one declarative plan:

    filtered variants ⋈ questions (broadcast)
      → prompt columns (template compiled to concat, F8/F9)
      → run_index fan-out  (explode(sequence(0, n-1)))
      → anti-join already-generated   (idempotent resume, ST3)
      → LLM map stage                (UD1, Arrow-batched)
      → letter extraction + correctness (F4/F7/F10)
      → deterministic row ids         (safe under task retry)

The returned DataFrame holds only *new* answer rows; the caller appends
them to the answers sink (``mode("append")`` parquet / Delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.functions.extract import (
    extract_letter,
    format_choices,
    mcq_correct,
    template_format,
)
from lexam_data_pipeline_spark.model import (
    DEFAULT_MAX_TOKENS,
    DEFAULT_N_ANSWERS,
    DEFAULT_TEMPERATURE,
)
from lexam_data_pipeline_spark.operators.filters import filtered_variants
from lexam_data_pipeline_spark.pipeline.llm import llm_map


def build_generation_prompts(
    variants_q: DataFrame, mcq_prompt: str, open_question_prompt: str
) -> DataFrame:
    """Prompt construction (ref generation.py:22-37): MCQ question text is
    question + blank line + lettered choices; template placeholders are
    course_name/question."""
    is_mcq = F.col("config").startswith("mcq_")
    question_text = F.when(
        is_mcq & F.col("choices").isNotNull(),
        F.concat(F.col("question"), F.lit("\n\n"), format_choices(F.col("choices"))),
    ).otherwise(F.col("question"))
    with_text = variants_q.withColumn("question_text", question_text)
    mcq_col = template_format(
        mcq_prompt, {"course_name": F.col("course"), "question": F.col("question_text")}
    )
    open_col = template_format(
        open_question_prompt,
        {"course_name": F.col("course"), "question": F.col("question_text")},
    )
    return with_text.withColumn("prompt", F.when(is_mcq, mcq_col).otherwise(open_col))


def answer_id(experiment_id: F.Column, variant_id: F.Column, run_index: F.Column) -> F.Column:
    """Deterministic answer id: stable across retries and resumes, so the
    append sink + anti-join gives effective exactly-once (ST3)."""
    return F.xxhash64(
        F.lit("answer"), experiment_id.cast("long"), variant_id.cast("long"), run_index.cast("int")
    )


def run_generation(
    experiment: dict,
    variants: DataFrame,
    questions: DataFrame,
    *,
    client_spec: dict,
    existing_answers: DataFrame | None = None,
    completed_acc=None,
    failed_acc=None,
    parallelism: int | None = None,
) -> DataFrame:
    """Produce the new answer rows for an experiment.

    ``experiment`` is a plain dict mirroring the experiments row
    (filter_config already parsed).  ``existing_answers`` enables
    idempotent resume: rows whose (experiment, variant, run) already exist
    are skipped before any LLM call is made (ref generation anti-pattern:
    it re-runs everything; judging.py:42-52 has the skip — we apply it to
    both stages).
    """
    exp_id = int(experiment["id"])
    n_answers = int(experiment.get("n_answers") or DEFAULT_N_ANSWERS)
    temperature = experiment.get("temperature")
    temperature = DEFAULT_TEMPERATURE if temperature is None else float(temperature)
    max_tokens = int(experiment.get("max_tokens") or DEFAULT_MAX_TOKENS)

    base = filtered_variants(variants, questions, experiment.get("filter_config") or {})
    prompts = build_generation_prompts(
        base,
        experiment["mcq_prompt"],
        experiment["open_question_prompt"],
    )
    fanned = prompts.withColumn(
        "run_index", F.explode(F.sequence(F.lit(0), F.lit(n_answers - 1)))
    )
    work = fanned.select(
        F.lit(exp_id).cast("long").alias("experiment_id"),
        F.col("id").alias("variant_id"),
        F.col("run_index").cast("int"),
        F.col("config"),
        F.col("gold"),
        F.col("prompt"),
    )
    if existing_answers is not None:
        # Errored rows do NOT count as done: the reference rolls back failed
        # calls (services/generation.py:130-139 — no row is written), so a
        # re-run retries them.  Callers that own an answers sink must purge
        # errored rows before appending the retry output (see
        # ExperimentStore.purge_errored_answers), or the retried success row
        # would duplicate the errored row's deterministic id.
        done = (
            existing_answers.filter(F.col("experiment_id") == exp_id)
            .filter(F.col("error").isNull())
            .select("variant_id", "run_index")
        )
        work = work.join(done, ["variant_id", "run_index"], "left_anti")
    if parallelism:
        work = work.repartition(parallelism)

    called = llm_map(
        work,
        client_spec=client_spec,
        model=experiment.get("model_name") or "mock-model",
        temperature=temperature,
        max_tokens=max_tokens,
        completed_acc=completed_acc,
        failed_acc=failed_acc,
    )

    is_mcq = F.col("config").startswith("mcq_")
    letter = F.when(
        is_mcq & F.col("gold").isNotNull() & F.col("error").isNull(),
        extract_letter(F.col("content")),
    )
    return called.select(
        answer_id(F.col("experiment_id"), F.col("variant_id"), F.col("run_index")).alias("id"),
        "experiment_id",
        "variant_id",
        "run_index",
        F.lit(experiment.get("model_name") or "mock-model").alias("model_name"),
        F.col("content").alias("answer_text"),
        letter.alias("extracted_letter"),
        F.when(
            is_mcq & F.col("gold").isNotNull() & F.col("error").isNull(),
            mcq_correct(letter, F.col("gold")),
        ).alias("mcq_correct"),
        "input_tokens",
        "output_tokens",
        "error",
        F.current_timestamp().alias("created_at"),
    )
