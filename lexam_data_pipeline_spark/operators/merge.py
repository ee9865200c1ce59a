"""Distributed MERGE / upsert (CDC apply) as a full-outer coalesce.

The reference's only upsert is first-sight insert at seeding
(``/root/reference/backend/app/seed.py:86-109``); a real pipeline also
needs the other half — UPDATE on match — to apply change feeds to a
snapshot.  Without a transactional table format, the Spark-native shape
is a full-outer join on the key with per-column ``coalesce(update,
base)``: one shuffle on the key, no driver involvement, and the output
is a complete new snapshot partition-for-partition.

At 100 TB the join is the whole story: the snapshot side is huge and
the update side is usually small, so Spark's AQE converts the join to
broadcast when the feed fits, and otherwise both sides shuffle on the
same key — if the snapshot is bucketed by the key at write time the
snapshot side's shuffle disappears entirely.  Deletes compose as an
anti-join *before* the merge (see ``pipeline/experiment.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Apply ``updates`` over ``base``: matched keys take the update row,
    unmatched update keys are inserted, everything else keeps the base row.

    Both inputs must share a schema.  Adds nothing to the schema; column
    order follows ``base``.  Equivalent SQL::

        MERGE INTO base USING updates ON <keys>
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """
    cols = base.columns
    if updates.columns != cols:
        raise ValueError(f"schema mismatch: {updates.columns} vs {cols}")
    u = updates.select([F.col(c).alias(f"__u_{c}") for c in cols])
    cond = [base[k] == u[f"__u_{k}"] for k in keys]
    joined = base.join(u, cond, "full_outer")
    return joined.select(
        [F.coalesce(f"__u_{c}", c).alias(c) for c in cols]
    )


def apply_changefeed(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed (insert / update / delete rows) to a
    snapshot, producing the next snapshot.

    ``changes`` carries the base schema plus ``op_col`` ∈ {'insert',
    'update', 'delete'}; delete rows only need their key columns
    populated.  The inverse of snapshot *diffing*
    (``plans.fixture_queries.q_snapshot_diff`` classifies; this
    applies): ``apply_changefeed(old, diff(old, new)) == new`` —
    the roundtrip tests/test_merge.py pins.

    Shape: one anti-join (deletes) + one full-outer merge (upserts),
    both on the same key — with the snapshot bucketed by key at write
    time neither shuffles the snapshot side, and AQE broadcasts a small
    feed.  Last-writer-wins within a feed is the caller's contract (feed
    a compacted changeset, one row per key, as real CDC readers emit)."""
    deletes = changes.filter(F.col(op_col) == "delete").select(*keys)
    survivors = base.join(deletes, list(keys), "left_anti")
    upserts = changes.filter(F.col(op_col) != "delete").drop(op_col)
    return merge_upsert(survivors, upserts, keys)
