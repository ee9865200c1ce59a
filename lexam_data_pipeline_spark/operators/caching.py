"""Bounded persist slots for serving helpers.

Serving functions persist an intermediate that several returned frames
share (one scan feeding stats + histogram + listings).  The frames are
lazy, so the function can't unpersist after "the" action — but never
releasing means a long-lived session (driver correctness runs, bench
loops, a REPL) accumulates one orphaned cache per call (ADVICE r1).

``persist_slot`` keeps at most ONE live cache per named slot: the next
call through the same slot releases the previous handle.  If a caller
still holds frames over an evicted handle, Spark silently recomputes —
a perf cost only, never a correctness one (these persists are cache
hints, not lineage cuts; the lineage-cut persist in ``ml/dedup`` keeps
its own reuse-keyed slot for exactly that reason).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}

#: extra teardown hooks run by :func:`release_all` — for module-local
#: caches that cannot live in ``_SLOTS`` (e.g. ``ml/dedup``'s
#: lineage-cut persist, which is reuse-keyed rather than slot-keyed).
#: Registering here guarantees no cache outlives a ``release_all()``
#: boundary, so nothing persists between bench runs.
_RELEASE_HOOKS: list[Callable[[], None]] = []


def register_release_hook(fn: Callable[[], None]) -> None:
    if fn not in _RELEASE_HOOKS:
        _RELEASE_HOOKS.append(fn)


def qopt_enabled() -> bool:
    """Round-11 query-shape optimizations (action fusion via slot
    persists — see OPTIMIZATION_r11.md).  ``SPARK_GRAFT_QOPT=0`` forces
    the pre-optimization shapes everywhere: the A/B hook for the
    interleaved measurement protocol and a production kill-switch, the
    same pattern as ``SPARK_GRAFT_SCAN_FANOUT``.  Read at call time so
    one session can interleave both variants."""
    return os.environ.get("SPARK_GRAFT_QOPT", "") != "0"


def persist_slot(df: DataFrame, slot: str) -> DataFrame:
    prev = _SLOTS.get(slot)
    if prev is not None:
        prev.unpersist()
    out = df.persist()
    _SLOTS[slot] = out
    return out


def release_all() -> None:
    """Drop every slot's cache (e.g. at session teardown)."""
    for df in _SLOTS.values():
        df.unpersist()
    _SLOTS.clear()
    for fn in _RELEASE_HOOKS:
        fn()
