"""BM25 retrieval + hybrid RRF fusion + robust stats + time decay +
char-class quality (round-3 operators).

Behavioral tests on literal frames; oracle parity for the driver keys is
re-checked by tools/parity_sweep.py against DuckDB.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.ml.retrieval import (
    B,
    K1,
    K1_PLUS_1,
    SCORE_SCALE,
    bm25_scores,
)
from lexam_data_pipeline_spark.operators.robust import mad_outliers, winsorized_mean


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_rare_term_outranks_common(self, spark):
        # 'zebra' appears in one doc, 'data' in all → zebra doc wins
        docs = _docs(
            spark,
            [
                (1, "data data data data"),
                (2, "zebra data"),
                (3, "data table"),
                (4, "data table table"),
            ],
        )
        scores = {
            r["doc_id"]: r["score_scaled"]
            for r in bm25_scores(docs, ("zebra", "data")).collect()
        }
        assert scores[2] == max(scores.values())

    def test_matches_reference_formula(self, spark):
        docs = _docs(spark, [(1, "a b c"), (2, "a a b"), (3, "c c c c")])
        rows = {
            (r["doc_id"]): r
            for r in bm25_scores(docs, ("a", "c")).collect()
        }
        # independent python reference
        corpus = {1: ["a", "b", "c"], 2: ["a", "a", "b"], 3: ["c", "c", "c", "c"]}
        n = len(corpus)
        avgdl = sum(len(t) for t in corpus.values()) / n
        dfs = {
            t: sum(1 for toks in corpus.values() if t in toks) for t in ("a", "c")
        }
        for doc_id, toks in corpus.items():
            expected = 0
            n_terms = 0
            for t in ("a", "c"):
                tf = toks.count(t)
                if tf == 0:
                    continue
                n_terms += 1
                idf = (n - dfs[t] + 0.5) / (dfs[t] + 0.5)
                tfp = (tf * K1_PLUS_1) / (
                    tf + K1 * (1.0 - B + B * (len(toks) / avgdl))
                )
                expected += math.floor(idf * tfp * float(SCORE_SCALE))
            assert rows[doc_id]["score_scaled"] == expected
            assert rows[doc_id]["n_terms"] == n_terms

    def test_longer_doc_penalized_at_equal_tf(self, spark):
        docs = _docs(spark, [(1, "x y"), (2, "x y y y y y y y")])
        scores = {
            r["doc_id"]: r["score_scaled"]
            for r in bm25_scores(docs, ("x",)).collect()
        }
        assert scores[1] > scores[2]


class TestHybridRRF:
    def test_rrf_fuses_both_rankings(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.ml.retrieval import q_hybrid_rrf

        rows = q_hybrid_rrf(spark, sf_oracle).collect()
        assert len(rows) == 10
        # fused score strictly positive and sorted desc with doc_id tiebreak
        vals = [(r["rrf_scaled"], r["doc_id"]) for r in rows]
        assert vals == sorted(vals, key=lambda v: (-v[0], v[1]))
        # at least one row must carry both ranks (fusion, not union)
        assert any(r["r_lex"] is not None and r["r_vec"] is not None for r in rows)


class TestRobustStats:
    def test_mad_flags_planted_outlier(self, spark):
        rows = [("g", float(v)) for v in [10, 11, 12, 13, 14, 9, 10, 11]] + [
            ("g", 1000.0)
        ]
        df = spark.createDataFrame(rows, "grp string, val double")
        out = mad_outliers(df, "grp", "val").collect()[0]
        assert out["n_outliers"] == 1
        assert out["median_value"] == pytest.approx(11.0)

    def test_mad_zero_on_constant_data(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0)] * 6, "grp string, val double"
        )
        out = mad_outliers(df, "grp", "val").collect()[0]
        assert out["mad_value"] == 0.0
        assert out["n_outliers"] == 0

    def test_winsorized_mean_tames_tail(self, spark):
        rows = [("g", float(v)) for v in range(1, 20)] + [("g", 10000.0)]
        df = spark.createDataFrame(rows, "grp string, val double")
        wm = winsorized_mean(df, "grp", "val").collect()[0]["winsorized_mean"]
        plain = sum(range(1, 20)) / 20 + 500.0
        assert wm < plain / 5  # clipped mean far below the raw mean
        assert wm > 9.0  # but still near the bulk's center


class TestTimeDecay:
    def test_recent_events_dominate(self, spark, tmp_path):
        import pandas as pd

        ev = pd.DataFrame(
            {
                "event_id": [1, 2],
                "ts": pd.to_datetime(["2024-01-30", "2024-01-01"]),
                "user_id": [1, 2],
                "event_type": ["view", "view"],
                "value": [10.0, 10.0],
                "props": ["{}", "{}"],
            }
        )
        path = str(tmp_path / "tdecay")
        (tmp_path / "tdecay").mkdir()
        ev.to_parquet(path + "/events.parquet")
        from lexam_data_pipeline_spark.plans.fixture_queries import q_time_decay

        rows = {r["user_id"]: r for r in q_time_decay(spark, path).collect()}
        # same value: user 1's event is 2 days old, user 2's is 31 days old
        assert rows[1]["decayed_value"] > rows[2]["decayed_value"]
        assert rows[1]["decayed_value"] == pytest.approx(10.0 / 3, abs=1e-3)
        assert rows[2]["decayed_value"] == pytest.approx(10.0 / 32, abs=1e-3)


class TestCharClassStats:
    def test_gini_zero_for_single_class(self, spark, tmp_path):
        import pandas as pd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["abcdef", "123 456!"],
                "lang": ["pure", "mixed"],
                "source": ["s", "s"],
                "n_chars": [6, 8],
            }
        )
        path = str(tmp_path / "ccs")
        (tmp_path / "ccs").mkdir()
        docs.to_parquet(path + "/documents.parquet")
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_char_class_stats,
        )

        rows = {r["lang"]: r for r in q_char_class_stats(spark, path).collect()}
        assert rows["pure"]["class_gini"] == 0.0  # all alpha
        assert rows["pure"]["alpha_ratio"] == 1.0
        # mixed: 6 digits, 1 space, 1 other of 8 chars
        assert rows["mixed"]["c_digit"] == 6
        expected_gini = 1.0 - ((6 / 8) ** 2 + (1 / 8) ** 2 + (1 / 8) ** 2)
        assert rows["mixed"]["class_gini"] == pytest.approx(expected_gini, abs=1e-4)


class TestScoreNormalize:
    def test_zscore_and_pct_rank(self, spark, tmp_path):
        import pandas as pd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a", "b", "c", "d"],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [10, 20, 30, 40],
            }
        )
        (tmp_path / "sn").mkdir()
        docs.to_parquet(str(tmp_path / "sn" / "documents.parquet"))
        from lexam_data_pipeline_spark.plans.fixture_queries import q_score_normalize

        rows = {r["doc_id"]: r for r in q_score_normalize(spark, str(tmp_path / "sn")).collect()}
        # mean 25, sample std = sqrt(500/3); z of 40 = 15/12.9099 = 1.1619
        assert rows[4]["z_score"] == pytest.approx(1.1619, abs=1e-4)
        assert rows[1]["z_score"] == pytest.approx(-1.1619, abs=1e-4)
        assert rows[1]["pct_rank"] == 0.0
        assert rows[4]["pct_rank"] == 1.0
        assert rows[2]["pct_rank"] == pytest.approx(1 / 3, abs=1e-4)


class TestBM25EdgeCases:
    def test_empty_terms_raises(self, spark):
        docs = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            bm25_scores(docs, ())

    def test_term_absent_everywhere_yields_no_rows(self, spark):
        docs = _docs(spark, [(1, "a b"), (2, "b c")])
        assert bm25_scores(docs, ("zzz",)).count() == 0

    def test_identical_docs_score_identically(self, spark):
        docs = _docs(spark, [(i, "x y z") for i in range(5)])
        scores = {r["score_scaled"] for r in bm25_scores(docs, ("x",)).collect()}
        assert len(scores) == 1

    def test_single_doc_corpus(self, spark):
        docs = _docs(spark, [(7, "x x y")])
        row = bm25_scores(docs, ("x", "y")).collect()[0]
        assert row["doc_id"] == 7
        assert row["n_terms"] == 2
        # idf = (1 - 1 + 0.5)/(1 + 0.5) = 1/3 > 0: scores stay positive
        assert row["score_scaled"] > 0


class TestHardNegatives:
    def test_excludes_near_duplicates(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.ml.similarity import q_hard_negatives

        rows = q_hard_negatives(spark, sf_oracle).collect()
        assert all(r["cosine"] < 0.95 for r in rows)
        per_anchor = {}
        for r in rows:
            per_anchor.setdefault(r["q_id"], []).append(r)
        assert len(per_anchor) == 4
        for anchor_rows in per_anchor.values():
            assert [r["rnk"] for r in sorted(anchor_rows, key=lambda x: x["rnk"])] == [1, 2, 3]
            cosines = [r["cosine"] for r in sorted(anchor_rows, key=lambda x: x["rnk"])]
            assert cosines == sorted(cosines, reverse=True)


class TestLengthBuckets:
    def test_bucket_math(self, spark, tmp_path):
        import pandas as pd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["w", "a b c", "a b c d", " ".join(["t"] * 9)],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [1, 5, 7, 17],
            }
        )
        (tmp_path / "lb").mkdir()
        docs.to_parquet(str(tmp_path / "lb" / "documents.parquet"))
        from lexam_data_pipeline_spark.plans.fixture_queries import q_length_buckets

        rows = {r["bucket_len"]: r for r in q_length_buckets(spark, str(tmp_path / "lb")).collect()}
        assert rows[1]["n_seqs"] == 1  # 1 token → bucket 1, zero waste
        assert rows[1]["waste_tokens"] == 0
        assert rows[4]["n_seqs"] == 2  # 3 and 4 tokens → bucket 4
        assert rows[4]["real_tokens"] == 7
        assert rows[4]["waste_tokens"] == 1
        assert rows[16]["n_seqs"] == 1  # 9 tokens → bucket 16
        assert rows[16]["waste_tokens"] == 7


class TestEvalOps:
    def test_kappa_perfect_agreement(self, spark, tmp_path):
        import pandas as pd

        # texts whose marker votes exactly match the lang column
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["the cat is here", "der hund ist gut", "the dog is fast", "le chat est la"],
                "lang": ["en", "de", "en", "fr"],
                "source": ["s"] * 4,
                "n_chars": [10] * 4,
            }
        )
        (tmp_path / "ka").mkdir()
        docs.to_parquet(str(tmp_path / "ka" / "documents.parquet"))
        from lexam_data_pipeline_spark.plans.fixture_queries import q_judge_agreement

        row = q_judge_agreement(spark, str(tmp_path / "ka")).collect()[0]
        assert row["observed_agreement"] == 1.0
        assert row["kappa"] == 1.0

    def test_pr_curve_monotone_recall(self, spark, sf_small):
        from lexam_data_pipeline_spark.plans.fixture_queries import q_pr_curve

        rows = sorted(q_pr_curve(spark, sf_small).collect(), key=lambda r: r["threshold"])
        recalls = [r["recall"] for r in rows]
        assert recalls == sorted(recalls, reverse=True)  # recall falls as t rises
        assert all(0.0 <= r["precision"] <= 1.0 for r in rows)


class TestAnalyticsOps:
    def test_hourly_anomalies_flags_planted_spike(self, spark, tmp_path):
        import pandas as pd

        rows = []
        eid = 0
        for h in range(24):  # steady baseline: 5 events/hour
            for i in range(5):
                rows.append((eid, f"2024-01-01 {h:02d}:10:{i:02d}", 1, "view", 1.0, "{}"))
                eid += 1
        for i in range(100):  # planted spike in hour 12
            rows.append((eid, f"2024-01-01 12:30:{i % 60:02d}", 1, "view", 1.0, "{}"))
            eid += 1
        ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
        ev["ts"] = pd.to_datetime(ev["ts"])
        (tmp_path / "an").mkdir()
        ev.to_parquet(str(tmp_path / "an" / "events.parquet"))
        from lexam_data_pipeline_spark.plans.fixture_queries import q_hourly_anomalies

        row = q_hourly_anomalies(spark, str(tmp_path / "an")).collect()[0]
        assert row["n_anomalous"] == 1
        assert row["max_abs_z"] > 4.0

    def test_cooccur_lift_prefers_exclusive_pairs(self, spark, tmp_path):
        import pandas as pd

        texts = ["alpha beta filler"] * 5 + ["gamma filler", "delta filler"] * 5
        docs = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        )
        (tmp_path / "co").mkdir()
        docs.to_parquet(str(tmp_path / "co" / "documents.parquet"))
        from lexam_data_pipeline_spark.plans.fixture_queries import q_cooccur_lift

        rows = q_cooccur_lift(spark, str(tmp_path / "co")).collect()
        top = rows[0]
        # alpha+beta always co-occur and only with each other → highest lift
        assert (top["a"], top["b"]) == ("alpha", "beta")
        n = len(texts)
        assert top["lift"] == pytest.approx(n / 5, abs=1e-4)  # P(ab)N/(5·5)·... = 15/5
