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
