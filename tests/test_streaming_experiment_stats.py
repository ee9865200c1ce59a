"""Incremental /stats maintenance must serve a report cell-identical to
the batch q_experiment_stats flatten after draining ANY micro-batch
split of the answers/judgments streams — including the open-answer
semi-join discipline (a judgment counts only once its NULL-letter
answer is known) and the exact interpolated median rebuilt from the
score cells."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F

from lexam_data_pipeline_spark.plans.fixture_queries import (
    _lexam_answers_projection,
    q_experiment_stats,
)
from lexam_data_pipeline_spark.streaming.experiment_stats import (
    STATE_TABLES,
    _SCHEMAS,
    _median_from_cells,
    experiment_stats_fold_answers,
    experiment_stats_fold_judgments,
    experiment_stats_report,
    start_streaming_experiment_stats,
)


class _Holder:
    def __init__(self, spark):
        self.spark, self.rows = spark, {}

    def read(self, name: str) -> DataFrame | None:
        if name not in self.rows:
            return None
        return self.spark.createDataFrame(self.rows[name], _SCHEMAS[name])

    def write(self, name: str, df: DataFrame) -> None:
        self.rows[name] = df.collect()

    def state(self):
        return {t: self.read(t) for t in STATE_TABLES}


def _rows(df: DataFrame) -> list:
    return sorted(tuple(r) for r in df.collect())


def _drain(spark, proj, k: int, order=None) -> _Holder:
    questions, variants, answers, judgments = proj
    holder = _Holder(spark)
    for i in order if order is not None else range(k):
        a_chunk = answers.filter(F.pmod(F.col("id"), F.lit(k)) == i)
        st = experiment_stats_fold_answers(
            holder.state(), a_chunk, variants, questions, experiment_id=1
        )
        # the generate→judge ordering: this trigger's judgments are the
        # ones referencing this trigger's answers
        j_chunk = judgments.join(
            a_chunk.select(F.col("id").alias("answer_id")), "answer_id", "left_semi"
        )
        st = experiment_stats_fold_judgments(st, j_chunk)
        for t in STATE_TABLES:
            holder.write(t, st[t])
    return holder


@pytest.fixture(scope="module")
def proj(spark, sf_small):
    q, v, a, j = _lexam_answers_projection(spark, sf_small)
    return q, v, a.cache(), j.cache()


@pytest.mark.parametrize("k", [1, 3])
def test_drained_report_equals_batch_key(spark, sf_small, proj, k):
    holder = _drain(spark, proj, k)
    got = _rows(experiment_stats_report(holder.state()))
    want = _rows(q_experiment_stats(spark, sf_small))
    assert got == want


def test_split_order_invariance(spark, sf_small, proj):
    holder = _drain(spark, proj, 3, order=(2, 0, 1))
    got = _rows(experiment_stats_report(holder.state()))
    want = _rows(q_experiment_stats(spark, sf_small))
    assert got == want


def test_judgment_lags_answer_by_a_trigger(spark, sf_small, proj):
    """Judgments folded one trigger AFTER their answers (the other legal
    ordering under the contract) must converge to the same cells."""
    questions, variants, answers, judgments = proj
    holder = _Holder(spark)
    k = 3
    prev_ids = None
    for i in range(k + 1):
        if i < k:
            a_chunk = answers.filter(F.pmod(F.col("id"), F.lit(k)) == i)
        else:
            a_chunk = answers.filter(F.lit(False))  # drain trigger
        st = experiment_stats_fold_answers(
            holder.state(), a_chunk, variants, questions, experiment_id=1
        )
        if prev_ids is not None:
            j_chunk = judgments.join(prev_ids, "answer_id", "left_semi")
            st = experiment_stats_fold_judgments(st, j_chunk)
        for t in STATE_TABLES:
            holder.write(t, st[t])
        prev_ids = a_chunk.select(F.col("id").alias("answer_id"))
    got = _rows(experiment_stats_report(holder.state()))
    want = _rows(q_experiment_stats(spark, sf_small))
    assert got == want


def test_median_interpolation_formula():
    """The cell-median rebuild is percentile(0.5): even-count midpoint
    interpolated, odd-count exact value, empty → 0."""
    assert _median_from_cells([]) == 0.0
    assert _median_from_cells([(0.5, 3)]) == 0.5
    assert _median_from_cells([(0.0, 1), (1.0, 1)]) == 0.5
    assert _median_from_cells([(0.0, 2), (0.25, 1), (1.0, 2)]) == 0.25
    assert _median_from_cells([(0.0, 1), (0.25, 1), (0.75, 1), (1.0, 1)]) == 0.5


def test_streaming_drain_equals_batch(spark, sf_small, proj, tmp_path):
    """End-to-end through foreachBatch: answer files arrive one per
    trigger; each trigger folds that batch's judgments from the
    judgment source (generate→judge ordering)."""
    questions, variants, answers, judgments = proj
    chunk_dir = str(tmp_path / "answer_chunks")
    for i in range(3):
        answers.filter(F.pmod(F.col("id"), F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(chunk_dir)
    stream = (
        spark.readStream.schema(answers.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    holder = _Holder(spark)
    q = start_streaming_experiment_stats(
        stream, judgments, variants, questions,
        holder.read, holder.write, experiment_id=1,
    )
    q.awaitTermination(120)
    got = _rows(experiment_stats_report(holder.state()))
    want = _rows(q_experiment_stats(spark, sf_small))
    assert got == want
