"""LEXam data model: explicit schemas for the five reference tables.

Mirror of the reference's SQLAlchemy declarations
(`backend/app/models.py:8-171`) as Spark ``StructType``s over Parquet.
Nullability follows the reference: the three boolean flags are 3-valued
(NULL ≠ False — filters must preserve that, ref main.py:93-97).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The five presentation configs (ref seed.py:8-14).
CONFIGS = (
    "mcq_4_choices",
    "mcq_8_choices",
    "mcq_16_choices",
    "mcq_32_choices",
    "open_question",
)

QUESTIONS_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("question", StringType(), False),
        StructField("course", StringType(), False),
        StructField("language", StringType(), False),
        StructField("area", StringType(), False),
        StructField("jurisdiction", StringType(), False),
        StructField("year", IntegerType(), True),
        StructField("n_statements", IntegerType(), True),
        StructField("none_as_an_option", BooleanType(), True),
        StructField("negative_question", BooleanType(), True),
        StructField("international", BooleanType(), True),
    ]
)

VARIANTS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("question_id", StringType(), False),
        StructField("config", StringType(), False),
        StructField("split", StringType(), False),
        StructField("choices", ArrayType(StringType()), True),
        StructField("gold", IntegerType(), True),
        StructField("answer", StringType(), True),
    ]
)

EXPERIMENTS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("filter_config", StringType(), True),  # JSON dict of string-lists
        StructField("mcq_prompt", StringType(), True),
        StructField("open_question_prompt", StringType(), True),
        StructField("judge_prompt", StringType(), True),
        StructField("judge_system_prompt", StringType(), True),
        StructField("model_name", StringType(), True),
        StructField("temperature", DoubleType(), True),
        StructField("max_tokens", IntegerType(), True),
        StructField("judge_temperature", DoubleType(), True),
        StructField("judge_max_tokens", IntegerType(), True),
        StructField("n_answers", IntegerType(), True),
        StructField("status", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

ANSWERS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("experiment_id", LongType(), False),
        StructField("variant_id", LongType(), False),
        StructField("run_index", IntegerType(), False),
        StructField("model_name", StringType(), True),
        StructField("answer_text", StringType(), True),
        StructField("extracted_letter", StringType(), True),
        StructField("mcq_correct", BooleanType(), True),
        StructField("input_tokens", IntegerType(), True),
        StructField("output_tokens", IntegerType(), True),
        StructField("error", StringType(), True),  # row-level failure isolation (ST4)
        StructField("created_at", TimestampType(), True),
    ]
)

JUDGMENTS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("answer_id", LongType(), False),
        StructField("judge_model", StringType(), False),
        StructField("judgment_text", StringType(), True),
        StructField("score", DoubleType(), True),
        StructField("input_tokens", IntegerType(), True),
        StructField("output_tokens", IntegerType(), True),
        StructField("error", StringType(), True),
        StructField("created_at", TimestampType(), True),
    ]
)

#: Experiment status machine (ref models.py:41-136).
STATUSES = ("created", "generating", "generated", "judging", "completed", "error")

#: Sampling defaults (ref models.py:126-130).
DEFAULT_TEMPERATURE = 0.7
DEFAULT_MAX_TOKENS = 2048
DEFAULT_JUDGE_TEMPERATURE = 0.3
DEFAULT_JUDGE_MAX_TOKENS = 4096
DEFAULT_N_ANSWERS = 1
