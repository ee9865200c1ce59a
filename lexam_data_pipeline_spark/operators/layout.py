"""Data-layout operators: Z-order (Morton) clustering keys and
range-clustered writes for scan-pruning at 100 TB.

Why this matters at scale: parquet readers prune row groups with
column min/max statistics, but statistics only help when values are
*clustered*.  A Z-order key interleaves the bits of two (or more)
dimensions so that sorting by the single key co-locates rows that are
close in BOTH dimensions — multi-dimensional data skipping from
one-dimensional range partitioning (the technique behind
Databricks/Delta OPTIMIZE ZORDER and Iceberg's sort orders; public
literature: Morton 1966, "Z-order curve").

Everything is integer bit arithmetic in whole-stage codegen — exactly
reproducible in ANSI SQL, so the fixture query is oracle-checked.

Reference parity note: the reference (SQLAlchemy/SQLite) has no layout
surface; this extends SURVEY.md §2's sink story (S6) with the write
path a Spark engine needs for large tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave two non-negative ints of ``bits`` bits each into
    one ``2*bits``-bit key: x occupies even bit positions, y odd.

    2·bits shift/mask terms — small enough that codegen keeps the whole
    computation in registers (bits=8 → 16 terms; stay well under the
    janino 64 KB method limit documented in the verify skill).
    """
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB/ANSI twin of :func:`zorder_key` — generated with the
    same term order so integer results are identical."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` clustered by Z-order: range-partition on the Morton
    key (disjoint per-file key ranges by construction), sort within each
    file so parquet page stats are tight, drop the helper column.

    At cluster scale ``repartitionByRange`` samples the key distribution
    and produces balanced files; with AQE on, skewed ranges split
    further.  Readers filtering on either dimension then prune most
    files from the footer stats alone.
    """
    (
        df.withColumn("__zkey", zorder_key(x, y, bits))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_write_bucketed(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    bits: int = 8,
    cell_bits: int = 2,
) -> None:
    """Z-order layout with DIRECTORY-level pruning: partition the output
    by the top ``2*cell_bits`` bits of the Morton key.

    Those top bits are exactly the interleave of x's and y's top
    ``cell_bits`` bits, so each directory is a square cell in (x, y)
    space — a reader that decomposes its x/y box into cells
    (:func:`zbuckets_for_box`) prunes whole directories from the file
    index, on top of the row-group stats pruning that the within-file
    sort already provides.  2^(2*cell_bits) directories (default 16):
    coarse enough that files stay large, fine enough to skip most of
    the table for selective boxes.
    """
    shift = 2 * (bits - cell_bits)
    (
        df.withColumn("__zkey", zorder_key(x, y, bits))
        .withColumn("zbucket", F.shiftright(F.col("__zkey"), shift))
        .repartition("zbucket")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )


def zbuckets_for_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int = 8, cell_bits: int = 2
) -> list[int]:
    """Decompose an inclusive (x, y) box into the Z-cell buckets it
    intersects — the reader-side rewrite that turns a box predicate into
    a partition filter over :func:`zorder_write_bucketed` output.

    Each bucket id's bits de-interleave into the cell's (x, y)
    coordinates; a cell of side ``2^(bits - cell_bits)`` intersects the
    box iff its square overlaps it.  O(4^cell_bits) driver work —
    constants, no data touched.
    """
    side = 1 << (bits - cell_bits)
    out = []
    for bucket in range(1 << (2 * cell_bits)):
        xc = yc = 0
        for i in range(cell_bits):
            xc |= ((bucket >> (2 * i)) & 1) << i
            yc |= ((bucket >> (2 * i + 1)) & 1) << i
        cx_lo, cx_hi = xc * side, (xc + 1) * side - 1
        cy_lo, cy_hi = yc * side, (yc + 1) * side - 1
        if cx_lo <= x_hi and x_lo <= cx_hi and cy_lo <= y_hi and y_lo <= cy_hi:
            out.append(bucket)
    return out


def read_zorder_box(
    spark, path: str, x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    bits: int = 8, cell_bits: int = 2,
    x_col: str = "x", y_col: str = "y",
) -> DataFrame:
    """Read a :func:`zorder_write_bucketed` table restricted to an
    inclusive (x, y) box: the bucket IN-list becomes a partition filter
    (directories skipped in the file index), the x/y predicates remain
    for exactness and parquet row-group pruning."""
    buckets = zbuckets_for_box(x_lo, x_hi, y_lo, y_hi, bits, cell_bits)
    df = spark.read.parquet(path)
    return df.filter(
        F.col("zbucket").isin(buckets)
        & F.col(x_col).between(x_lo, x_hi)
        & F.col(y_col).between(y_lo, y_hi)
    )


def compaction_plan(path: str, target_bytes: int) -> list[dict]:
    """Bin-pack a directory's parquet data files into ``target_bytes``
    output groups (first-fit decreasing) — the planning half of
    small-file compaction, returned as plain rows so callers can audit
    or persist the plan before rewriting anything.

    Small files are the classic lake pathology: every file costs a task
    plus open/footer overhead, and at 100 TB a table that should be 10k
    files of 1 GB arrives as millions of 1 MB ones (streaming sinks,
    over-parallel writers).  Listing is driver-side metadata — one row
    per FILE, not per data row — the same scale class Spark's own
    InMemoryFileIndex already holds on the driver.
    """
    import os

    files = sorted(
        (
            (name, os.path.getsize(os.path.join(path, name)))
            for name in os.listdir(path)
            if name.endswith(".parquet")
        ),
        key=lambda t: (-t[1], t[0]),
    )
    bins: list[dict] = []
    for name, size in files:
        for b in bins:
            if b["bytes"] + size <= target_bytes:
                b["files"].append(name)
                b["bytes"] += size
                break
        else:
            bins.append({"bin": len(bins), "files": [name], "bytes": size})
    for b in bins:
        b["files"].sort()
    return bins


def compact_small_files(
    spark,
    path: str,
    out_path: str,
    target_bytes: int,
) -> dict:
    """Rewrite a small-file parquet directory as ``len(plan)`` files of
    roughly ``target_bytes`` each; returns before/after stats.

    Spark-first execution: ONE distributed job — ``coalesce(n)`` merges
    input splits without a shuffle (compaction preserves rows, not
    order), so each output task streams several small files to one big
    one.  The read side already packs small files into splits via
    ``spark.sql.files.maxPartitionBytes``/``openCostInBytes``; coalesce
    aligns the output file count with the byte-budget plan.  The write
    lands in ``out_path`` — callers swap it in atomically (the
    streaming state stores' versioned-pointer pattern) rather than
    overwriting a directory readers may be scanning.
    """
    import os

    plan = compaction_plan(path, target_bytes)
    before = [
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    n_bins = max(1, len(plan))
    spark.read.parquet(path).coalesce(n_bins).write.mode("overwrite").parquet(
        out_path
    )
    after = [
        os.path.getsize(os.path.join(out_path, f))
        for f in os.listdir(out_path)
        if f.endswith(".parquet")
    ]
    return {
        "files_before": len(before),
        "bytes_before": sum(before),
        "files_after": len(after),
        "bytes_after": sum(after),
        "planned_bins": n_bins,
    }
