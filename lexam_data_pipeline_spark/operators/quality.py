"""Declarative data-quality audit (Deequ/dbt-test-style constraints).

The reference trusts its inputs (no validation beyond FastAPI param
bounds — ``/root/reference/backend/app/main.py:173-174``); a 100 TB lake
cannot.  This operator compiles a list of declarative checks into the
MINIMUM number of Spark passes and returns one row per check:
``(check, n_violations)``.

Pass economy (the scale story):

* every row-local check (not-null, value-domain, range) folds into ONE
  shared aggregate over one scan — a ``sum(when(violated, 1))`` per
  check, partial-aggregated map-side, so k row-local checks cost one
  pass total, not k;
* a uniqueness check is one groupBy on the key counting rows in
  duplicated groups;
* a referential-integrity check is one left-anti join against the
  (distinct) parent keys — broadcast when the parent side is small.

All counts are exact integers — the audit is oracle-checkable
(``q_quality_audit``).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null:{self.col}"

    def violated(self) -> Column:
        return F.col(self.col).isNull()


@dataclass(frozen=True)
class InSet:
    col: str
    allowed: tuple

    @property
    def name(self) -> str:
        return f"in_set:{self.col}"

    def violated(self) -> Column:
        # NULL is not a domain violation — declare NotNull separately.
        return F.col(self.col).isNotNull() & ~F.col(self.col).isin(*self.allowed)


@dataclass(frozen=True)
class Range:
    col: str
    lo: float | None = None
    hi: float | None = None

    @property
    def name(self) -> str:
        return f"range:{self.col}"

    def violated(self) -> Column:
        v = F.lit(False)
        if self.lo is not None:
            v = v | (F.col(self.col) < self.lo)
        if self.hi is not None:
            v = v | (F.col(self.col) > self.hi)
        return F.col(self.col).isNotNull() & v


@dataclass(frozen=True)
class Unique:
    cols: tuple

    @property
    def name(self) -> str:
        return f"unique:{','.join(self.cols)}"


@dataclass(frozen=True)
class RefIntegrity:
    col: str
    parent: DataFrame
    parent_col: str

    @property
    def name(self) -> str:
        return f"ref:{self.col}->{self.parent_col}"


RowLocal = (NotNull, InSet, Range)


def audit(df: DataFrame, checks: Sequence) -> DataFrame:
    """Run every check; return ``(check, n_violations)`` rows.

    Row-local checks share one aggregate pass; each Unique/RefIntegrity
    check adds its own (unavoidable) shuffle or join.
    """
    parts: list[DataFrame] = []
    row_local = [c for c in checks if isinstance(c, RowLocal)]
    if row_local:
        agg = df.agg(
            *[
                F.sum(F.when(c.violated(), 1).otherwise(0))
                .cast("bigint")
                .alias(c.name)
                for c in row_local
            ]
        )
        stacked = agg.selectExpr(
            "stack({n}, {pairs}) as (check, n_violations)".format(
                n=len(row_local),
                pairs=", ".join(f"'{c.name}', `{c.name}`" for c in row_local),
            )
        )
        parts.append(stacked)
    for c in checks:
        if isinstance(c, Unique):
            dup = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_violations")
                )
                .select(F.lit(c.name).alias("check"), "n_violations")
            )
            parts.append(dup)
        elif isinstance(c, RefIntegrity):
            parents = c.parent.select(
                F.col(c.parent_col).alias("__pk")
            ).distinct()
            orphans = (
                df.join(parents, df[c.col] == F.col("__pk"), "left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
                .select(F.lit(c.name).alias("check"), "n_violations")
            )
            parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
