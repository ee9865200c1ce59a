"""Ingest operators (SURVEY §2.1 S1-S9): seed-equivalent, set-based.

The reference seeds row-by-row from HuggingFace per config
(`backend/app/seed.py:68-131`); here each config arrives as a DataFrame
and the whole seed is a declarative union + dedup + derive pipeline — one
shuffle on the question id, no per-row round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, StringType

from lexam_data_pipeline_spark.model import CONFIGS


def parse_choices(raw: F.Column) -> F.Column:
    """Stringified JSON list → array<string> (ref seed.py:112-118
    ast.literal_eval).  Single quotes are normalized first since the HF
    dump uses Python repr lists."""
    normalized = F.regexp_replace(raw, r"^\s*\[", "[")
    normalized = F.regexp_replace(normalized, r"'", '"')
    return F.from_json(normalized, ArrayType(StringType()))


def derive_year(raw_year: F.Column) -> F.Column:
    """First-4-chars cast (ref seed.py:90-94 int(raw_year[:4])).

    ``try_cast``, not ``cast``: under ANSI mode (Spark 4 default) a plain
    cast THROWS on malformed input and would fail the whole ingest job —
    the reference's ``int()`` likewise raises and kills the seed loop; we
    deliberately upgrade to NULL-and-continue (row-level failure
    isolation, the ST4 policy applied to ingest)."""
    return F.substring(raw_year.cast("string"), 1, 4).try_cast("int")


def derive_international(course: F.Column, international_courses: frozenset[str]) -> F.Column:
    """Set-membership derived flag (ref seed.py:16-60,107); the course set
    is configuration, not code."""
    return course.isin(*sorted(international_courses))


def union_configs(per_config: dict[str, DataFrame]) -> DataFrame:
    """Union per-config variant frames (S1/U1, ref seed.py:68-131), tagging
    each row with its config."""
    tagged = [
        df.withColumn("config", F.lit(cfg)) if "config" not in df.columns else df
        for cfg, df in per_config.items()
    ]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def first_config_wins(questions: DataFrame, id_col: str = "id") -> DataFrame:
    """Upsert-on-first-sight dedup (S2, ref seed.py:86-109): when several
    configs carry the same question, the earliest config in CONFIGS order
    wins — a deterministic analog of the reference's insert-if-absent loop.
    """
    order = F.array_position(
        F.array(*[F.lit(c) for c in CONFIGS]), F.col("_source_config")
    )
    w = Window.partitionBy(id_col).orderBy(order.asc(), F.col("_source_config"))
    return (
        questions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_source_config")
    )


def add_missing_columns(df: DataFrame, schema) -> DataFrame:
    """Schema-migration analog (S9, ref main.py:14-30 startup ALTERs):
    null-fill any column the frame lacks, then order columns."""
    for field in schema.fields:
        if field.name not in df.columns:
            df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
    return df.select(*[f.name for f in schema.fields])


def seed_guard(existing: DataFrame | None, config: str) -> bool:
    """Idempotent-seed check (ST3, ref seed.py:69-73): True if this config
    still needs seeding."""
    if existing is None:
        return True
    return existing.filter(F.col("config") == config).limit(1).count() == 0
