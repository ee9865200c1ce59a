"""Config-driven curation pipelines: a stage spec → ONE composed plan.

The reference drives its whole experiment tier from a stored JSON
``filter_config`` (models.py:47, applied at services/generation.py:
40-63).  This module extends that declare-then-run idea to the corpus
curation tier: a pipeline is a JSON-able list of stage dicts, compiled
onto the engine's existing operators into a single lazy DataFrame —
reproducible from config alone, diffable, and storable next to the
dataset card it produced.

Every stage maps to an already-tested operator (quality gate and dedup
from ml/curation.curate_corpus's building blocks, decontamination from
ml/decontam, sampling/splits/PII from ml/curation); composition adds no
new semantics, so correctness rides on the per-operator oracles and
tests.  Each stage is also a :class:`~...operators.observe.PipelineAudit`
gate when an audit is supplied — per-stage admitted-row counts ride the
final action's tasks for free.

Spec example::

    [
      {"op": "quality_gate", "min_words": 25, "max_words": 80},
      {"op": "pii_redact"},
      {"op": "dedup_exact"},
      {"op": "decontaminate", "benchmark": "doc_id % 10 = 0", "n": 4},
      {"op": "sample", "rate": 0.5, "salt": "v1"},
      {"op": "split", "salt": "split"},
    ]

Scale: the compiled plan is exactly what hand-composition produces —
map-only gates first, the one dedup shuffle, broadcast decontamination,
map-only sample/split last.  Catalyst sees ONE plan and fuses
projections across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.functions.text import word_count
from lexam_data_pipeline_spark.operators.observe import PipelineAudit


def _quality_gate(df: DataFrame, spec: dict) -> DataFrame:
    n = word_count(F.col(spec.get("text_col", "text"))).cast("int")
    return df.withColumn("n_words", n).where(
        F.col("n_words").between(spec.get("min_words", 25), spec.get("max_words", 80))
    )


def _pii_redact(df: DataFrame, spec: dict) -> DataFrame:
    from lexam_data_pipeline_spark.ml.curation import redact_pii

    col = spec.get("text_col", "text")
    return df.withColumn(col, redact_pii(F.col(col)))


def _dedup_exact(df: DataFrame, spec: dict) -> DataFrame:
    from lexam_data_pipeline_spark.ml.curation import dedup_exact_keep_first

    return dedup_exact_keep_first(
        df, spec.get("text_col", "text"), spec.get("id_col", "doc_id")
    )


def _decontaminate(df: DataFrame, spec: dict) -> DataFrame:
    from lexam_data_pipeline_spark.ml.decontam import decontaminate

    id_col = spec.get("id_col", "doc_id")
    bench = df.sparkSession.table(spec["benchmark_table"]) if "benchmark_table" in spec else None
    if bench is None:
        # benchmark defined as a predicate over the corpus itself; NULL
        # predicate rows belong to the corpus side (plain NOT() would
        # silently drop them from both sides)
        bench = df.where(spec["benchmark"])
        df = df.where(f"NOT coalesce(({spec['benchmark']}), false)")
    hits = decontaminate(df, bench, id_col=id_col, n=spec.get("n", 8))
    return df.join(hits.select(id_col), id_col, "left_anti")


def _dedup_neardup(df: DataFrame, spec: dict) -> DataFrame:
    """Near-duplicate removal via MinHash-LSH: candidate pairs above the
    estimated-Jaccard threshold, then ONE anti-join dropping every doc
    that has ANY earlier near-duplicate (it appears as a pair's
    doc_id_b) — deliberately a superset of greedy keep-earliest: in a
    chain A~B, B~C (A≁C), greedy would re-admit C once B is gone, while
    this rule also drops C.  The one-pass superset is the standard
    at-scale trade (greedy needs iterative chain resolution ≈ connected
    components; ``ml.dedup.dedup_clusters`` provides that when exact
    keep-one-per-cluster semantics are required).  The banded-LSH
    100 TB dedup path as a declarative stage (exact variant:
    ``dedup_exact``)."""
    from lexam_data_pipeline_spark.ml.dedup import minhash_lsh_candidate_pairs

    id_col = spec.get("id_col", "doc_id")
    docs = df if id_col == "doc_id" else df.withColumnRenamed(id_col, "doc_id")
    dups = (
        minhash_lsh_candidate_pairs(docs, slot="declarative.neardup_sig")
        .where(F.col("est_jaccard") >= spec.get("threshold", 0.5))
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )
    out = docs.join(dups, "doc_id", "left_anti")
    return out if id_col == "doc_id" else out.withColumnRenamed("doc_id", id_col)


def _lang_filter(df: DataFrame, spec: dict) -> DataFrame:
    """Keep documents whose heuristic language ID is in ``langs`` —
    marker-vote scoring inline (map-side, no shuffle)."""
    from lexam_data_pipeline_spark.functions.text import tokens
    from lexam_data_pipeline_spark.ml.textstats import lang_scores, predict_lang

    toks = F.transform(tokens(spec.get("text_col", "text")), F.lower)
    pred = predict_lang(lang_scores(toks))
    return df.where(pred.isin(*spec["langs"]))


def _sample(df: DataFrame, spec: dict) -> DataFrame:
    from lexam_data_pipeline_spark.ml.curation import hash_sample

    key = F.col(spec.get("id_col", "doc_id"))
    return hash_sample(df, key, spec["rate"], salt=spec.get("salt", ""))


def _split(df: DataFrame, spec: dict) -> DataFrame:
    from lexam_data_pipeline_spark.ml.curation import split_assign

    key = F.col(spec.get("id_col", "doc_id"))
    return df.withColumn("split", split_assign(key, salt=spec.get("salt", "split")))


_STAGES = {
    "quality_gate": _quality_gate,
    "pii_redact": _pii_redact,
    "dedup_exact": _dedup_exact,
    "dedup_neardup": _dedup_neardup,
    "decontaminate": _decontaminate,
    "lang_filter": _lang_filter,
    "sample": _sample,
    "split": _split,
}


def build_pipeline(
    docs: DataFrame,
    spec: list[dict],
    audit: PipelineAudit | None = None,
) -> DataFrame:
    """Compile a stage spec onto ``docs``; returns one lazy DataFrame.

    Unknown ops fail fast with the known vocabulary; with ``audit``,
    the input and every stage output become observation gates named
    ``ingest`` / the stage op (suffixed on repeats).
    """
    if audit is not None:
        docs = audit.gate(docs, "ingest")
    seen: dict[str, int] = {}
    out = docs
    for stage in spec:
        op = stage.get("op")
        if op not in _STAGES:
            raise ValueError(f"unknown stage op {op!r}; known: {sorted(_STAGES)}")
        out = _STAGES[op](out, stage)
        if audit is not None:
            seen[op] = seen.get(op, 0) + 1
            name = op if seen[op] == 1 else f"{op}#{seen[op]}"
            out = audit.gate(out, name)
    return out
