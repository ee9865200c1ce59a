"""Full-stack integration: orchestrated generation + judging feed the
serving statistics layer — the reference's complete user journey
(seed → experiment → generate → judge → stats endpoints) on one engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.pipeline.experiment import ExperimentRunner, ExperimentStore
from lexam_data_pipeline_spark.serving import (
    breakdown_by_field,
    compare_judges,
    experiment_stats,
    stats_by_question,
)
from tests.lexam_data import lexam_tables
from tests.test_pipeline import EXPERIMENT, MOCK_JUDGE, MOCK_MCQ


@pytest.fixture(scope="module")
def pipeline_output(spark, tmp_path_factory):
    t = lexam_tables(spark)
    store = ExperimentStore(spark, str(tmp_path_factory.mktemp("integration")))
    runner = ExperimentRunner(store, t["variants"], t["questions"], client_spec=MOCK_MCQ)
    store.save_experiment(EXPERIMENT)
    runner.generate(7)
    runner.client_spec = MOCK_JUDGE
    runner.judge(7, "judge-a")
    store.set_status(7, "generated")  # allow a second judge pass
    runner.judge(7, "judge-b")
    return t, store


def test_stats_consistency(spark, pipeline_output):
    t, store = pipeline_output
    answers, judgments = store.answers(), store.judgments()
    s = experiment_stats(answers, judgments, experiment_id=7, n_answers=2)
    o = s["overall"].collect()[0]
    # 10 variants × 2 runs; 6 MCQ variants produce letters
    assert o["total_answers"] == 20
    assert o["mcq_total"] == 12 and o["open_total"] == 8
    # judged = open answers × 2 judges
    assert s["open"].collect()[0]["judged"] == 16
    # histogram covers every judged score
    dist = s["score_distribution"].agg(F.sum("count")).collect()[0][0]
    assert dist == 16
    sc = s["self_consistency"].collect()[0]
    assert sc["total_variants"] == 6 and sc["unanimous"] == 6  # mock is deterministic


def test_breakdowns_cover_all_areas(spark, pipeline_output):
    t, store = pipeline_output
    rows = breakdown_by_field(
        store.answers(), store.judgments(), t["variants"], t["questions"],
        experiment_id=7, field="area",
    ).collect()
    by = {r["name"]: r for r in rows}
    assert set(by) == {"Private", "Public", "Criminal"}
    # every area's answer rows are accounted for (mcq + open = total per area)
    total = sum(r["mcq_total"] + r["open_total"] for r in rows)
    # open_total counts judgments (2 judges × open answers)
    assert total == 12 + 16


def test_compare_judges_sees_both(spark, pipeline_output):
    _, store = pipeline_output
    rows = compare_judges(store.answers(), store.judgments(), experiment_id=7).collect()
    assert [r["judge_model"] for r in rows] == ["judge-a", "judge-b"]
    assert all(r["judged"] == 8 for r in rows)
    # both judges saw identical prompts → identical deterministic scores
    assert rows[0]["avg_score"] == rows[1]["avg_score"]


def test_stats_by_question_rollup(spark, pipeline_output):
    t, store = pipeline_output
    rows = stats_by_question(
        store.answers(), store.judgments(), t["variants"], t["questions"], experiment_id=7
    ).collect()
    assert len(rows) == 6  # one per question
    assert sum(r["answer_count"] for r in rows) == 20
    assert sum(r["judgment_count"] for r in rows) == 16
    # sorted by avg score desc with NULLs (never-judged pure-MCQ questions) last
    scores = [r["avg_score"] if r["avg_score"] is not None else 0.0 for r in rows]
    assert scores == sorted(scores, reverse=True)
