"""IVF (inverted-file) approximate nearest neighbor — the cluster-probe
scale path for similarity search (north star; complements the
hyperplane-LSH variant in :mod:`lexam_data_pipeline_spark.ml.similarity`).

Index build = a few Lloyd iterations of k-means expressed as DataFrame
programs: assign (crossJoin with broadcast centroids, argmin distance) →
update (explode dimensions, per-(cluster, dim) mean).  Centroids are
model state — k×dim doubles — so the driver-side collect between
iterations is O(k·dim), not O(data); at 100 TB the per-iteration cost is
one broadcast-assign scan + one (cluster, dim)-keyed aggregation, both
shuffle-light.

Probe = assign the query to its ``n_probe`` nearest centroids and rank
only those clusters' members.  Search cost drops ~k/n_probe-fold; recall
depends on how clusterable the corpus is (declared rows-only — recall is
data-dependent, not ANSI-SQL-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml.similarity import _fold_sum, cosine


def _sq_dist(a, b) -> F.Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid id per vector (one broadcast-free scan: centroids
    ride into the plan as literal arrays).

    Argmin is ``array_position(dists, array_min(dists))``, NOT a chained
    ``when(d < best_d, ...)`` fold — each step of that fold embeds two
    copies of the previous best-distance expression, so the tree grows
    2^k and the driver OOMs in Catalyst before a single row moves.  The
    array form is k independent subtrees (linear), with first-occurrence
    tie-breaking for determinism."""
    dists = F.array(
        *[
            _sq_dist(F.col("e"), F.array(*[F.lit(v) for v in c]))
            for c in centroids
        ]
    )
    return emb.withColumn("__d", dists).withColumn(
        "cluster", (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1).cast("int")
    ).drop("__d")


def build_ivf_index(
    emb: DataFrame, k: int = 16, iterations: int = 3
) -> tuple[DataFrame, list[list[float]]]:
    """(assigned corpus, centroids).  Deterministic: seeds are the k
    lowest-vec_id vectors, updates are exact means."""
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    seeds = base.orderBy("vec_id").limit(k).collect()
    centroids = [list(r["e"]) for r in seeds]
    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = _assign(base, centroids)
        means = (
            assigned.select("cluster", F.posexplode("e").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.transform("dm", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        new = {r["cluster"]: list(r["centroid"]) for r in means}
        # empty clusters keep their previous centroid
        centroids = [new.get(cid, centroids[cid]) for cid in range(k)]
        assert all(len(c) == dim for c in centroids)
    return _assign(base, centroids), centroids


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    *,
    n_probe: int = 4,
    top_k: int = 10,
) -> DataFrame:
    """Rank only the n_probe nearest clusters' members by cosine."""

    def sq(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = sorted(range(len(centroids)), key=lambda cid: sq(centroids[cid], query_vec))
    probe_ids = probe[:n_probe]
    q = F.array(*[F.lit(v) for v in query_vec])
    return (
        assigned.filter(F.col("cluster").isin(probe_ids))
        .select("vec_id", "cluster", cosine(F.col("e"), q).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(top_k)
        .select("vec_id", "cluster", F.round("cos_raw", 6).alias("cosine"))
    )


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 for the lowest-vec_id query vector (rows-only check:
    recall is data-dependent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_index(emb, k=16, iterations=3)
    assigned = assigned.cache()
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    query_vec = [float(x) for x in qrow["embedding"]]
    return ivf_search(
        assigned.filter(F.col("vec_id") != qrow["vec_id"]), centroids, query_vec
    )
