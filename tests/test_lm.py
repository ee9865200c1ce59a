"""Pure-Python oracle for the rows-only bigram-LM surprisal key: an
independent implementation of the same add-one-smoothed bigram model
over the collected corpus must agree per document and per language.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.lm import (
    SURPRISAL_BITS_FLAG,
    doc_surprisal,
    q_lm_surprisal,
)


@pytest.fixture(scope="module")
def ref(spark, sf_small):
    """Independent model: dict-based counts over the collected docs."""
    rows = load_table(spark, sf_small, "documents").collect()
    docs = []
    for r in rows:
        ws = [w for w in (r["text"] or "").strip().lower().split() if w]
        if len(ws) >= 2:
            docs.append((r["doc_id"], r["lang"], ws))
    c12, c1, vocab = Counter(), Counter(), set()
    for _, _, ws in docs:
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    per_doc = {}
    for doc_id, lang, ws in docs:
        bits = [
            -math.log2((c12[(a, b)] + 1.0) / (c1[a] + v))
            for a, b in zip(ws, ws[1:])
        ]
        per_doc[doc_id] = (lang, len(bits), sum(bits) / len(bits))
    return per_doc


def test_per_doc_surprisal_matches_reference(spark, sf_small, ref):
    docs = load_table(spark, sf_small, "documents")
    got = {
        r["doc_id"]: (r["lang"], r["n_bigrams"], r["bits"])
        for r in doc_surprisal(docs).collect()
    }
    assert set(got) == set(ref)
    for doc_id, (lang, n, bits) in ref.items():
        g_lang, g_n, g_bits = got[doc_id]
        assert (g_lang, g_n) == (lang, n)
        assert g_bits == pytest.approx(bits, rel=1e-9)


def test_contract_key_matches_reference_rollup(spark, sf_small, ref):
    df = q_lm_surprisal(spark, sf_small)
    rows = {r["lang"]: r for r in df.collect()}
    assert df.columns == ["lang", "n_docs", "avg_bits", "n_flagged"]
    by_lang: dict[str, list[float]] = {}
    for lang, _, bits in ref.values():
        by_lang.setdefault(lang, []).append(bits)
    assert set(rows) == set(by_lang)
    for lang, bits in by_lang.items():
        r = rows[lang]
        assert r["n_docs"] == len(bits)
        assert r["avg_bits"] == pytest.approx(
            sum(bits) / len(bits), rel=1e-6
        )
        assert r["n_flagged"] == sum(
            1 for b in bits if b > SURPRISAL_BITS_FLAG
        )
    # the gate is informative on the fixture: it neither drops nothing
    # nor everything
    total_flagged = sum(r["n_flagged"] for r in rows.values())
    total = sum(r["n_docs"] for r in rows.values())
    assert 0 <= total_flagged < total
