"""Compression-ratio quality signal — the Gopher/FineWeb-style corpus
heuristic: highly compressible text (boilerplate, repeated templates,
keyword stuffing) compresses far below ~0.4 bytes/byte, while natural
prose sits near 0.5-0.7; per-source ratios flag low-quality feeds
before they enter a training mix.

Spark shape: one Arrow-batched ``mapInPandas`` kernel (zlib level 6 —
compression is genuinely Python/C work, the declared exception to the
no-Python rule, same tier as the multimodal codecs), emitting exact
integer (raw_bytes, compressed_bytes) per document; everything after is
one map-side-combinable aggregate.  The kernel is self-contained
(stdlib-only imports inside the closure) so executor workers need
nothing importable.

Rows-only by declared design: DuckDB has no zlib, so there is no SQL
twin.  ``tests/test_compress.py`` is the oracle — an independent
driver-side recompute over the same parquet must agree exactly (zlib
output is deterministic for a fixed library version and level, and the
CPython zlib in the kernel and the test is the same binary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table

#: zlib compression level (deterministic output for a fixed level).
ZLIB_LEVEL = 6


def compression_stats(docs: DataFrame) -> DataFrame:
    """Per-document exact byte counts: ``doc_id, source, raw_bytes,
    comp_bytes`` (UTF-8 length and zlib-level-6 compressed length)."""

    level = ZLIB_LEVEL  # captured by value; kernel stays self-contained

    def kernel(batches):
        import zlib

        import pandas as _pd

        for pdf in batches:
            raw, comp = [], []
            for text in pdf["text"]:
                data = (text or "").encode("utf-8")
                raw.append(len(data))
                comp.append(len(zlib.compress(data, level)))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "raw_bytes": _pd.Series(raw, dtype="int64"),
                    "comp_bytes": _pd.Series(comp, dtype="int64"),
                }
            )

    return docs.select("doc_id", "source", "text").mapInPandas(
        kernel,
        "doc_id long, source string, raw_bytes long, comp_bytes long",
    )


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compression audit: document count, exact raw/compressed
    byte totals, and the aggregate compression ratio — plus the count of
    documents individually below the 0.4 suspicious-compressibility
    threshold.  Rows-only (no SQL zlib); tests/test_compress.py is the
    oracle."""
    docs = load_table(spark, sf_dir, "documents")
    stats = compression_stats(docs)
    return (
        stats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("raw_bytes").cast("bigint").alias("raw_bytes"),
            F.sum("comp_bytes").cast("bigint").alias("comp_bytes"),
            F.round(
                F.sum("comp_bytes") / F.nullif(F.sum("raw_bytes"), F.lit(0)),
                6,
            ).alias("ratio"),
            F.sum(
                (
                    F.col("comp_bytes").cast("double")
                    < F.lit(0.4) * F.col("raw_bytes")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_suspicious"),
        )
        .orderBy("source")
    )
