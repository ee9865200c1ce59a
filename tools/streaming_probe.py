#!/usr/bin/env python
"""Per-trigger wall-clock + state-size probe for the incremental
maintainers (round-9 verdict item 7, extended to the round-10 graph
maintainers).

For each maintainer: fold a fixed micro-batch schedule at 1× and at 10×
input volume, timing EVERY trigger (fold + state materialization — the
state backs onto persisted DataFrames, the local stand-in for a
parquet/Delta state table) and reporting final state-table row counts.
The claims under test:

* /stats + judge-stats: state is CELL-bounded — 10× more answers must
  NOT produce 10× more cells in the bounded tables (the only per-row
  tables, open_names/exp_ids/q_map, are the documented semi-join
  targets and grow linearly by design).
* clusters: per-trigger cost is O(batch) against the label table — a
  fixed-size batch folds in comparable time whether the accumulated
  corpus is 1× or 10×.
* LPA: per-trigger cost tracks the TOUCHED component's edge count, not
  the corpus edge count.
* PageRank: warm folds stop at the early-stop boundary — per-trigger
  rounds stay fixed while the per-round edge scan grows with the graph
  (inherent to the operator).

Usage: python tools/streaming_probe.py [sf_dir]  (default sf0.1)
Prints one JSON line per maintainer per scale.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from lexam_data_pipeline_spark.session import get_spark  # noqa: E402

OFF = 1_000_000_000


class DFState:
    """Named-table state on persisted DataFrames — the local stand-in
    for a parquet/Delta state table (collect-based holders would time
    driver serialization instead of the distributed fold)."""

    def __init__(self):
        self.tables: dict[str, DataFrame] = {}

    def read(self, name: str) -> DataFrame | None:
        return self.tables.get(name)

    def write(self, name: str, df: DataFrame) -> None:
        new = df.persist()
        new.count()  # materialize BEFORE dropping the old generation
        old = self.tables.get(name)
        if old is not None:
            old.unpersist()
        self.tables[name] = new

    def sizes(self) -> dict[str, int]:
        return {n: df.count() for n, df in self.tables.items()}


def _inflate(df: DataFrame, id_cols: tuple[str, ...], copies: int) -> DataFrame:
    if copies <= 1:
        return df
    out = df
    for c in range(1, copies):
        shifted = df
        for col in id_cols:
            shifted = shifted.withColumn(col, F.col(col) + F.lit(c * OFF))
        out = out.unionByName(shifted)
    return out


def _timed_folds(state, tables, fold_fns):
    walls = []
    for fold in fold_fns:
        t0 = time.perf_counter()
        st = fold({t: state.read(t) for t in tables})
        for t in tables:
            state.write(t, st[t])
        walls.append(round(time.perf_counter() - t0, 2))
    return walls


def probe_experiment_stats(spark, sf_dir: str, copies: int) -> dict:
    from lexam_data_pipeline_spark.plans.fixture_queries import (
        _lexam_answers_projection,
    )
    from lexam_data_pipeline_spark.streaming.experiment_stats import (
        STATE_TABLES,
        experiment_stats_fold_answers,
        experiment_stats_fold_judgments,
        experiment_stats_report,
    )

    questions, variants, answers, judgments = _lexam_answers_projection(spark, sf_dir)
    answers = _inflate(answers, ("id",), copies).persist()
    judgments = _inflate(judgments, ("answer_id",), copies).persist()
    n_a, n_j = answers.count(), judgments.count()
    state = DFState()

    def make_fold(i, k=3):
        def fold(st):
            a_chunk = answers.filter(F.pmod(F.col("id"), F.lit(k)) == i)
            st = experiment_stats_fold_answers(
                st, a_chunk, variants, questions, experiment_id=1
            )
            j_chunk = judgments.join(
                a_chunk.select(F.col("id").alias("answer_id")),
                "answer_id",
                "left_semi",
            )
            return experiment_stats_fold_judgments(st, j_chunk)

        return fold

    walls = _timed_folds(state, STATE_TABLES, [make_fold(i) for i in range(3)])
    t0 = time.perf_counter()
    experiment_stats_report({t: state.read(t) for t in STATE_TABLES}).count()
    serve = round(time.perf_counter() - t0, 2)
    out = {
        "maintainer": "experiment_stats",
        "copies": copies,
        "input_rows": n_a + n_j,
        "trigger_walls": walls,
        "serve_wall": serve,
        "state_rows": state.sizes(),
    }
    answers.unpersist(), judgments.unpersist()
    return out


def probe_judge_stats(spark, sf_dir: str, copies: int) -> dict:
    from lexam_data_pipeline_spark.plans.fixture_queries import (
        _lexam_answers_projection,
    )
    from lexam_data_pipeline_spark.streaming.judge_stats import (
        STATE_TABLES,
        judge_stats_fold_answers,
        judge_stats_fold_judgments,
        judge_stats_report,
    )

    questions, variants, answers, judgments = _lexam_answers_projection(spark, sf_dir)
    answers = _inflate(answers, ("id",), copies).persist()
    judgments = _inflate(judgments, ("answer_id",), copies).persist()
    n_a, n_j = answers.count(), judgments.count()
    state = DFState()

    def make_fold(i, k=3):
        def fold(st):
            a_chunk = answers.filter(F.pmod(F.col("id"), F.lit(k)) == i)
            st = judge_stats_fold_answers(
                st, a_chunk, variants, questions,
                experiment_id=1, model_name="model-a",
            )
            j_chunk = judgments.join(
                a_chunk.select(F.col("id").alias("answer_id")),
                "answer_id",
                "left_semi",
            )
            return judge_stats_fold_judgments(st, j_chunk)

        return fold

    walls = _timed_folds(state, STATE_TABLES, [make_fold(i) for i in range(3)])
    t0 = time.perf_counter()
    judge_stats_report({t: state.read(t) for t in STATE_TABLES}).count()
    serve = round(time.perf_counter() - t0, 2)
    out = {
        "maintainer": "judge_stats",
        "copies": copies,
        "input_rows": n_a + n_j,
        "trigger_walls": walls,
        "serve_wall": serve,
        "state_rows": state.sizes(),
    }
    answers.unpersist(), judgments.unpersist()
    return out


CLUSTER_SIZE = 20  # leaves per dup-cluster hub


def _star_edges(spark, n: int, a: str = "doc_id_a", b: str = "doc_id_b") -> DataFrame:
    """Deterministic star-shaped near-dup pairs: each node links to its
    cluster hub (id - id mod CLUSTER_SIZE).  Shallow components — the
    realistic dedup-cluster shape, and the regime the default min-label
    CC is designed for (deep adversarial chains take the documented
    two_phase door instead)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias(a),
            (F.col("id") - F.pmod(F.col("id"), F.lit(CLUSTER_SIZE))).alias(b),
        )
        .filter(F.col(a) != F.col(b))
    )


def probe_minhash(spark, sf_dir: str, copies: int) -> dict:
    """Fold the documents table in 3 batches.  Under ×copies the corpus
    is DUPLICATED (ids shifted, text identical), so every copy group is
    a near-dup clique — pair-state growth there is OUTPUT, not waste
    (a duplicated corpus genuinely has those pairs); the per-trigger
    claim is that the batch×state probe joins only the batch's postings
    into the bucket index."""
    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.streaming.minhash import (
        STATE_TABLES as MH_TABLES,
        minhash_merge,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = _inflate(docs, ("doc_id",), copies).persist()
    n_docs = docs.count()
    state = DFState()
    walls = []
    for i in range(3):
        chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        t0 = time.perf_counter()
        st = minhash_merge({t: state.read(t) for t in MH_TABLES}, chunk)
        for t in MH_TABLES:
            state.write(t, st[t])
        walls.append(round(time.perf_counter() - t0, 2))
    out = {
        "maintainer": "minhash",
        "copies": copies,
        "n_docs": n_docs,
        "trigger_walls": walls,
        "state_rows": state.sizes(),
    }
    docs.unpersist()
    return out


def probe_clusters(spark, n_base: int, copies: int) -> dict:
    """Fold `copies`-scaled corpus edges, then time a FIXED-size final
    batch — the O(batch) claim: that trigger's wall must not scale with
    the accumulated corpus."""
    from lexam_data_pipeline_spark.streaming.clusters import clusters_merge

    n = n_base * copies
    corpus = _star_edges(spark, n).persist()
    corpus.count()
    state = DFState()
    walls = []
    for i in range(3):
        chunk = corpus.filter(F.pmod(F.col("doc_id_a"), F.lit(3)) == i)
        t0 = time.perf_counter()
        state.write("labels", clusters_merge(state.read("labels"), chunk))
        walls.append(round(time.perf_counter() - t0, 2))
    # the probe batch: 1000 edges regardless of corpus scale, merging
    # DISJOINT pairs of corpus clusters (real merges, shallow contracted
    # graph — a chain of bridges would be the adversarial deep case the
    # two_phase door covers)
    probe_batch = spark.range(1000).select(
        (F.col("id") * 2 * CLUSTER_SIZE).alias("doc_id_a"),
        ((F.col("id") * 2 + 1) * CLUSTER_SIZE).alias("doc_id_b"),
    )
    t0 = time.perf_counter()
    state.write("labels", clusters_merge(state.read("labels"), probe_batch))
    fixed_batch_wall = round(time.perf_counter() - t0, 2)
    out = {
        "maintainer": "clusters",
        "copies": copies,
        "corpus_edges": n,
        "trigger_walls": walls,
        "fixed_batch_wall": fixed_batch_wall,
        "state_rows": state.sizes(),
    }
    corpus.unpersist()
    return out


def probe_lpa(spark, n_base: int, copies: int) -> dict:
    """Load a `copies`-scaled multi-component corpus, then time a fixed
    small batch touching ONE component — per-trigger cost must track the
    touched component, not the corpus."""
    from lexam_data_pipeline_spark.streaming.graph import (
        LPA_STATE_TABLES,
        lpa_merge,
    )

    n = n_base * copies
    corpus = _star_edges(spark, n, a="u", b="v").persist()
    corpus.count()
    state = DFState()
    t0 = time.perf_counter()
    st = lpa_merge({t: None for t in LPA_STATE_TABLES}, corpus)
    for t in LPA_STATE_TABLES:
        state.write(t, st[t])
    corpus_fold_wall = round(time.perf_counter() - t0, 2)
    # fixed probe batch: new edges INSIDE component 0 only (leaf-to-leaf
    # chords of the first star) — touched work must stay one component
    probe_batch = spark.range(1, 15).select(
        F.col("id").alias("u"), (F.col("id") + 5).alias("v")
    )
    t0 = time.perf_counter()
    st = lpa_merge({t: state.read(t) for t in LPA_STATE_TABLES}, probe_batch)
    for t in LPA_STATE_TABLES:
        state.write(t, st[t])
    fixed_batch_wall = round(time.perf_counter() - t0, 2)
    out = {
        "maintainer": "lpa",
        "copies": copies,
        "corpus_edges": n,
        "corpus_fold_wall": corpus_fold_wall,
        "fixed_batch_wall": fixed_batch_wall,
        "state_rows": state.sizes(),
    }
    corpus.unpersist()
    return out


def probe_pagerank(spark, n_base: int, copies: int) -> dict:
    """Cold first fold (converges from uniform) then a warm no-op-ish
    fold (tiny batch) — the warm fold must be far cheaper: the early
    stop exits at its first boundary."""
    from lexam_data_pipeline_spark.streaming.graph import (
        PR_STATE_TABLES,
        pagerank_merge,
    )

    n = n_base * copies
    # ring + spokes to a hub: irregular (hub rank ≫ uniform), so the
    # cold fold pays real convergence rounds (a plain ring's fixed point
    # IS the uniform seed and would cost nothing)
    ring = spark.range(1, n + 1).select(
        F.col("id").alias("u"), (F.pmod(F.col("id"), F.lit(n)) + 1).alias("v")
    )
    spokes = spark.range(1, n + 1, 10).select(
        F.col("id").alias("u"), F.lit(0).cast("long").alias("v")
    )
    half = ring.unionByName(spokes)
    corpus = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    corpus.count()
    state = DFState()
    t0 = time.perf_counter()
    st = pagerank_merge({t: None for t in PR_STATE_TABLES}, corpus, tol=1e-6)
    for t in PR_STATE_TABLES:
        state.write(t, st[t])
    cold_wall = round(time.perf_counter() - t0, 2)
    probe_batch = spark.range(20).select(
        (F.col("id") + 1).alias("u"), (F.col("id") + 3).alias("v")
    )
    t0 = time.perf_counter()
    st = pagerank_merge(
        {t: state.read(t) for t in PR_STATE_TABLES}, probe_batch, tol=1e-6
    )
    for t in PR_STATE_TABLES:
        state.write(t, st[t])
    warm_wall = round(time.perf_counter() - t0, 2)
    out = {
        "maintainer": "pagerank",
        "copies": copies,
        "corpus_edges": 2 * n,
        "cold_fold_wall": cold_wall,
        "warm_fold_wall": warm_wall,
        "state_rows": state.sizes(),
    }
    corpus.unpersist()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="streaming-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for copies in (1, 10):
        for fn, args in (
            (probe_experiment_stats, (spark, sf_dir, copies)),
            (probe_judge_stats, (spark, sf_dir, copies)),
            (probe_minhash, (spark, sf_dir, copies)),
            (probe_clusters, (spark, 100_000, copies)),
            (probe_lpa, (spark, 100_000, copies)),
            (probe_pagerank, (spark, 20_000, copies)),
        ):
            print(json.dumps(fn(*args)), flush=True)


if __name__ == "__main__":
    main()
