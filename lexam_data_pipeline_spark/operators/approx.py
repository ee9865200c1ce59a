"""Exact/approx aggregate switches (SURVEY §4: exact for oracle parity,
approx as the documented 100 TB path).

Exact ``percentile`` and ``count_distinct`` are *holistic*: every value
of a group must reach one reducer (memory ∝ group size).  At corpus scale
the sketch forms bound memory:

* ``percentile_approx`` — fixed-size QuantileSummaries sketch, mergeable
  map-side; ``accuracy`` trades memory for error (err ≤ 1/accuracy).
* ``approx_count_distinct`` — HyperLogLog++, ``rsd`` relative error.

The oracle-checked queries default to exact; flip ``exact=False`` when
pointing the same plans at the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_PERCENTILE_ACCURACY = 10_000  # err ≤ 0.01 %
DEFAULT_RSD = 0.05


def percentile_agg(
    col: Column | str,
    p: float,
    *,
    exact: bool = True,
    accuracy: int = DEFAULT_PERCENTILE_ACCURACY,
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if exact:
        return F.percentile(c, F.lit(p))
    return F.percentile_approx(c, F.lit(p), F.lit(accuracy))


def distinct_count(
    col: Column | str, *, exact: bool = True, rsd: float = DEFAULT_RSD
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if exact:
        return F.count_distinct(c)
    return F.approx_count_distinct(c, rsd=rsd)
