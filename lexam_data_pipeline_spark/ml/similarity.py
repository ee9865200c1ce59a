"""Similarity search over the ``embeddings`` fixture (north star).

* ``q_knn_bruteforce`` — exact cosine top-k against one query vector.
  The reduction is a *sequential left fold* (``F.aggregate``) in double,
  matching DuckDB's ``list_reduce`` bit-for-bit so the oracle can verify
  values, not just row counts.
* ``q_knn_lsh`` — random-hyperplane (sign) LSH: 8 deterministic
  pseudo-random planes bucket the corpus; search ranks only the query's
  bucket.  The scale path: bucketing is one narrow projection, and the
  candidate set shrinks ~2^planes-fold.

100 TB notes: the brute-force path is a broadcast of the query batch and
one scan — linear but embarrassingly parallel; the LSH path adds a
pre-computed bucket column (write-time clustering) so probe queries touch
only matching buckets via partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from lexam_data_pipeline_spark.catalog import load_table


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold sum in double — engine-portable (DuckDB's
    ``list_reduce`` applies the same association order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    na = F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))
    nb = F.sqrt(_fold_sum(F.transform(b, lambda x: x.cast("double") * x.cast("double"))))
    return dot(a, b) / (na * nb)


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of the lowest-vec_id embedding."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q_emb")).alias("cos_raw"),
        )
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for a BATCH of 4 query vectors —
    the serving shape (queries arrive in batches, not one at a time).

    Two-level top-k: a single window per query key would funnel the whole
    scored corpus through |batch| reducers.  Instead rank locally within
    (query × input-partition) first — B×P parallel sorts over slices —
    keep 5 per slice, then rank the ≤ B×P×5 survivors.  Exact by the
    union bound (every global top-5 row is a local top-5 row in its own
    partition), and the final result is partition-layout-independent, so
    the DuckDB oracle checks it with a plain per-query window.  At 100 TB
    this is the difference between 4 reducers sorting everything and full
    cluster width.
    """
    k, batch = 5, 4
    emb = load_table(spark, sf_dir, "embeddings")
    qs = (
        emb.orderBy("vec_id")
        .limit(batch)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q_emb")).alias("cos_raw"),
        )
    )
    from pyspark.sql import Window

    order = [F.desc("cos_raw"), F.asc("vec_id")]
    local = Window.partitionBy("q_id", F.spark_partition_id()).orderBy(*order)
    survivors = (
        scored.withColumn("__lrnk", F.row_number().over(local))
        .filter(F.col("__lrnk") <= k)
        .drop("__lrnk")
    )
    final = Window.partitionBy("q_id").orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(final))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "vec_id",
            "label",
            F.col("rnk").cast("int").alias("rnk"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def _lsh_planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (golden-ratio hash mix —
    reproducible across cluster runs without a broadcast RNG state)."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((state >> 11) / float(1 << 53) - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = (emb · plane_i) > 0."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = _fold_sum(
            F.zip_with(
                emb,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            )
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10: rank by cosine only within the query's
    hyperplane-sign bucket.  Rows-only check (bucket membership is
    implementation-defined)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    planes = _lsh_planes(dim, 8)
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    q = (
        bucketed.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("vec_id", "label", cosine(F.col("embedding"), F.col("q_emb")).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining: per anchor, the top-3 most-similar
    vectors that are NOT near-duplicates (cos < 0.95) — the standard
    hard-negative selection for embedding-model training (near-dups
    would be false negatives; easy negatives teach nothing).

    Same two-level exact top-k as :func:`q_knn_batch` (local per-slice
    rank, then global rank over survivors), with the dup-exclusion
    pushed below BOTH rank stages so excluded rows never shuffle.
    Oracle-exact: the sequential-fold cosine matches DuckDB
    ``list_reduce`` bit for bit."""
    k, batch, dup_cos = 3, 4, 0.95
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = (
        emb.orderBy("vec_id")
        .limit(batch)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q_emb")).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") < F.lit(dup_cos))
    )
    from pyspark.sql import Window

    order = [F.desc("cos_raw"), F.asc("vec_id")]
    local = Window.partitionBy("q_id", F.spark_partition_id()).orderBy(*order)
    survivors = (
        scored.withColumn("__lrnk", F.row_number().over(local))
        .filter(F.col("__lrnk") <= k)
        .drop("__lrnk")
    )
    final = Window.partitionBy("q_id").orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(final))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "vec_id",
            "label",
            F.col("rnk").cast("int").alias("rnk"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )
