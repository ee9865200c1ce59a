"""Scan fan-out: give map-heavy pipelines the cluster's parallelism.

Why this exists: parquet scans can only split BETWEEN row groups.  A
table written as one row group per file (exactly the shape of the
fixture inputs, and of any ingest that buffered a whole file before
flushing) yields ONE scan task per file no matter what
``spark.sql.files.maxPartitionBytes`` says — so every narrow stage
chained onto the scan (explode + partial aggregation, md5 fan-outs,
Arrow/pandas kernels, wide codegen projections) runs on a single core
while the rest of the cluster idles.  That is guide §2 stragglers in
their purest form: not skew between partitions, but a partition COUNT
below the hardware.

``fan_out`` repartitions such an input up to the session's default
parallelism — an explicit hash exchange of the scanned rows (cheap:
the rows were about to be shuffled or reduced anyway; the exchange
carries only the columns the downstream stage selected) that buys a
cluster-wide map stage.  It is deliberately scale-adaptive, NOT a
local[32] constant:

* the target is ``sparkContext.defaultParallelism`` — total cores on a
  real cluster, ``$SPARK_GRAFT_CPUS`` locally — so the driver's
  low-core bench re-runs and any production deployment each get their
  own right number;
* it is a NO-OP whenever the plan already has at least that many
  partitions (the 100 TB case: thousands of row groups → thousands of
  scan tasks), so production plans never pay an extra exchange.

Hash-partitioning on a caller-chosen key (never round-robin) keeps the
exchange deterministic under task retries (guide §2.5: round-robin
repartition pays a sort-before-repartition per task and risks
SPARK-38388-style retry divergence; a hash on a stable id does
neither).  Callers pick keys with enough distinct values to spread
(doc ids, order keys — 20-100x the partition count, per guide §2.5).

Correctness posture: a repartition changes only row placement.  Every
oracled query in this engine aggregates with exact integer/decimal
arithmetic or per-row expressions, both order- and
partitioning-independent, so plans gain parallelism without moving a
single output bit (re-verified by the full parity sweep at sf0.01 and
sf0.1 after this operator landed — see OPTIMIZATION_r11.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def fan_out(df: DataFrame, *keys: "Column | str") -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism by
    hash of ``keys`` — a no-op when the plan is already at least that
    wide (production scans) or when parallelism is 1 (nothing to gain).

    ``keys`` must be stable, high-cardinality columns of ``df``.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if n <= 1:
        return df
    # Production fast path (r11 VERDICT item 5): deciding "already wide
    # enough" via ``df.rdd.getNumPartitions()`` materializes the full
    # logical→physical conversion on the driver — on a 100 TB catalog
    # that includes listing every input file.  The optimizer's size
    # estimate divided by the scan split size bounds the partition
    # count from BELOW for a file scan (Spark packs at most
    # maxPartitionBytes per split), so when the estimate alone already
    # clears defaultParallelism the exchange is provably a no-op and no
    # physical planning is needed.  Small/unknown inputs fall through
    # to the exact check, whose driver cost is bounded by their size.
    try:
        est_bytes = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        max_split = int(
            sc._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                df.sparkSession.conf.get(
                    "spark.sql.files.maxPartitionBytes", "128m"
                )
            )
        )
        if max_split > 0 and est_bytes // max_split >= n:
            return df
    except Exception:  # noqa: BLE001 — estimate is an optimization only
        pass
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys)
