"""PageRank (ml/graph.py) — numpy power iteration is the oracle.

The driver records only a rows-only check for q_pagerank (cross-partition
float summation order is nondeterministic), so this test is the real
correctness gate: an independent dense numpy implementation must agree to
1e-9 on every node.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.ml.graph import DAMPING, N_ITER, pagerank, q_pagerank


def _numpy_pagerank(edges: list[tuple[int, int]], n_iter: int, d: float) -> dict[int, float]:
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        mass = np.zeros(n)
        for s, t in edges:
            mass[idx[t]] += rank[idx[s]] / out_deg[idx[s]]
        rank = (1.0 - d) / n + d * mass
    return {node: rank[i] for node, i in idx.items()}


class TestPageRank:
    def test_matches_numpy_on_toy_graph(self, spark):
        edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (1, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
        want = _numpy_pagerank(edges, N_ITER, DAMPING)
        assert set(got) == set(want)
        for node in want:
            assert got[node] == pytest.approx(want[node], abs=1e-9)

    def test_rank_mass_conserved_on_symmetric_graph(self, spark):
        # symmetrized graph has no dangling nodes → total rank == 1
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
        edges = pairs + [(b, a) for a, b in pairs]
        df = spark.createDataFrame(edges, "src long, dst long")
        total = pagerank(df).agg(F.sum("rank")).collect()[0][0]
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_hub_outranks_leaf(self, spark):
        # star: everything points at node 0 (and back, so no dangling)
        edges = [(i, 0) for i in range(1, 6)] + [(0, i) for i in range(1, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        ranks = {r["node"]: r["rank"] for r in pagerank(df).collect()}
        assert ranks[0] > max(v for k, v in ranks.items() if k != 0) * 2

    def test_fixture_query_matches_numpy(self, spark, sf_small):
        from lexam_data_pipeline_spark.catalog import load_table

        orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_suppkey")
        pairs = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("a"),
                (F.col("l_suppkey") * 2 + 1).alias("b"),
            )
            .distinct()
            .collect()
        )
        edges = [(r["a"], r["b"]) for r in pairs] + [(r["b"], r["a"]) for r in pairs]
        want = _numpy_pagerank(edges, N_ITER, DAMPING)
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = q_pagerank(spark, sf_small).collect()
        assert len(got) == 20
        for row, (node, rank) in zip(got, top):
            assert row["key"] == node // 2
            assert row["node_type"] == ("customer" if node % 2 == 0 else "supplier")
            assert row["rank"] == pytest.approx(rank, abs=1e-8)

    def test_symmetric_fast_path_equals_general(self, spark):
        pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5)]
        edges = pairs + [(b, a) for a, b in pairs]
        df = spark.createDataFrame(edges, "src long, dst long")
        general = {r["node"]: r["rank"] for r in pagerank(df, symmetric=False).collect()}
        fast = {r["node"]: r["rank"] for r in pagerank(df, symmetric=True).collect()}
        assert set(general) == set(fast)
        for node in general:
            assert fast[node] == pytest.approx(general[node], abs=1e-12)
