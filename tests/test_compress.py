"""Independent-oracle verification of the compression-ratio audit.

Rows-only key (DuckDB has no zlib), so the oracle is this module: a
driver-side recompute over the same parquet with the same stdlib zlib
must agree exactly — zlib output length is deterministic for a fixed
level and library build, and both sides run the same CPython binary.
"""

from __future__ import annotations

import zlib

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.compress import (
    ZLIB_LEVEL,
    compression_stats,
    q_compression_ratio,
)


def test_matches_driver_recompute(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    exp: dict[str, list[int]] = {}
    for r in docs:
        data = (r["text"] or "").encode("utf-8")
        raw, comp = len(data), len(zlib.compress(data, ZLIB_LEVEL))
        agg = exp.setdefault(r["source"], [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += raw
        agg[2] += comp
        agg[3] += int(comp < 0.4 * raw)
    got = q_compression_ratio(spark, sf_small).collect()
    assert len(got) == len(exp)
    for row in got:
        n, raw, comp, susp = exp[row["source"]]
        assert row["n_docs"] == n
        assert row["raw_bytes"] == raw
        assert row["comp_bytes"] == comp
        assert row["n_suspicious"] == susp
        assert row["ratio"] == round(comp / raw, 6)


def test_per_document_counts_exact(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    got = {
        r["doc_id"]: (r["raw_bytes"], r["comp_bytes"])
        for r in compression_stats(docs).collect()
    }
    sample = docs.select("doc_id", "text").limit(50).collect()
    for r in sample:
        data = (r["text"] or "").encode("utf-8")
        assert got[r["doc_id"]] == (len(data), len(zlib.compress(data, ZLIB_LEVEL)))

