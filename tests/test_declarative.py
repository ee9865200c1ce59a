"""Config-driven pipelines (pipeline/declarative.py): spec compilation,
equivalence with hand-composed operators, audit integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.operators.observe import PipelineAudit
from lexam_data_pipeline_spark.pipeline.declarative import build_pipeline


class TestBuildPipeline:
    def test_matches_hand_composed_curate_corpus(self, spark, sf_small):
        """The spec'd gate→dedup→sample must keep exactly the doc_ids the
        hand-written curate_corpus keeps (same operators, same salts)."""
        from lexam_data_pipeline_spark.ml.curation import curate_corpus

        docs = load_table(spark, sf_small, "documents")
        spec = [
            {"op": "quality_gate", "min_words": 25, "max_words": 80},
            {"op": "dedup_exact"},
            {"op": "sample", "rate": 0.5, "salt": ""},
        ]
        got = {r["doc_id"] for r in build_pipeline(docs, spec).select("doc_id").collect()}
        want = {
            r["doc_id"]
            for r in curate_corpus(docs, min_words=25, max_words=80, sample_rate=0.5)
            .select("doc_id")
            .collect()
        }
        assert got == want
        assert got  # non-empty

    def test_decontaminate_stage_drops_contaminated(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents")
        spec = [{"op": "decontaminate", "benchmark": "doc_id % 10 = 0", "n": 4}]
        out = build_pipeline(docs, spec)
        kept = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert all(d % 10 != 0 for d in kept)  # benchmark rows excluded
        corpus_ids = {
            r["doc_id"]
            for r in docs.where("doc_id % 10 != 0").select("doc_id").collect()
        }
        assert kept < corpus_ids  # something was actually decontaminated

    def test_split_stage_adds_column(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents")
        out = build_pipeline(docs, [{"op": "split"}])
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits <= {"train", "val", "test"}
        assert "train" in splits

    def test_unknown_op_fails_fast(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError, match="unknown stage op"):
            build_pipeline(docs, [{"op": "frobnicate"}])

    def test_audit_counts_every_stage(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents")
        audit = PipelineAudit()
        spec = [
            {"op": "quality_gate", "min_words": 25, "max_words": 80},
            {"op": "dedup_exact"},
            {"op": "sample", "rate": 0.5},
        ]
        out = build_pipeline(docs, spec, audit=audit)
        out.write.format("noop").mode("overwrite").save()
        rep = audit.report()
        assert list(rep) == ["ingest", "quality_gate", "dedup_exact", "sample"]
        rows = [rep[k]["rows"] for k in rep]
        assert rows == sorted(rows, reverse=True)  # monotone shrink
        assert rows[-1] > 0

    def test_pipeline_is_one_lazy_plan(self, spark, sf_small):
        """Spec compilation must not trigger any job — laziness check."""
        sc = spark.sparkContext
        docs = load_table(spark, sf_small, "documents")
        sc.setJobGroup("declare-probe", "probe")
        build_pipeline(
            docs,
            [
                {"op": "quality_gate"},
                {"op": "pii_redact"},
                {"op": "dedup_exact"},
                {"op": "sample", "rate": 0.9},
                {"op": "split"},
            ],
        )
        sc.setJobGroup(None, None)
        assert not (sc.statusTracker().getJobIdsForGroup("declare-probe") or [])


class TestRound4Stages:
    def test_dedup_neardup_drops_exactly_lsh_hits(self, spark, sf_small):
        """The stage must keep precisely the docs that do NOT appear as
        doc_id_b in an LSH pair above the threshold (greedy keep-earliest),
        recomputed independently here."""
        from lexam_data_pipeline_spark.ml.dedup import minhash_lsh_candidate_pairs
        from lexam_data_pipeline_spark.operators.caching import release_all

        docs = load_table(spark, sf_small, "documents")
        pairs = minhash_lsh_candidate_pairs(docs, slot="test.neardup_ref").collect()
        drop = {r["doc_id_b"] for r in pairs if r["est_jaccard"] >= 0.5}
        all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
        release_all()
        got = {
            r["doc_id"]
            for r in build_pipeline(docs, [{"op": "dedup_neardup", "threshold": 0.5}])
            .select("doc_id")
            .collect()
        }
        assert got == all_ids - drop
        assert drop, "fixture should contain at least one near-dup pair"

    def test_lang_filter_agrees_with_q_lang_id(self, spark, sf_small):
        from lexam_data_pipeline_spark.ml.textstats import q_lang_id

        docs = load_table(spark, sf_small, "documents")
        keep_langs = ["en", "de"]
        want = {
            r["doc_id"]
            for r in q_lang_id(spark, sf_small).collect()
            if r["predicted_lang"] in keep_langs
        }
        got = {
            r["doc_id"]
            for r in build_pipeline(docs, [{"op": "lang_filter", "langs": keep_langs}])
            .select("doc_id")
            .collect()
        }
        assert got == want and got
