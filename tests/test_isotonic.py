"""Independent-oracle verification of the PAV isotonic calibrator.

The contract key is rows-only (no SQL realization of the iterative PAV
sweep), so the oracle is this module: an independent numpy PAV over the
same exact per-bin integers must agree on every pooled rate, and the
structural isotonic-regression properties must hold.
"""

from __future__ import annotations

import numpy as np
import pytest

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.plans.fixture_queries import (
    CALIB_MOD,
    CALIB_MULT,
    ISO_BINS,
    q_isotonic_calibration,
)


@pytest.fixture(scope="module")
def bins(spark, sf_small):
    """Exact per-bin (n, n_pos) recomputed independently in Python."""
    rows = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).collect()
    n = np.zeros(ISO_BINS, dtype=np.int64)
    pos = np.zeros(ISO_BINS, dtype=np.int64)
    for r in rows:
        h = (r["o_orderkey"] % CALIB_MOD) * CALIB_MULT % CALIB_MOD
        b = (h * ISO_BINS) // CALIB_MOD
        n[b] += 1
        pos[b] += int(r["o_orderstatus"] == "F")
    return n, pos


def _independent_pav(n, pos):
    """Independent PAV formulation: REPEATED FULL SCANS merging the
    first adjacent violator (compared with exact ``Fraction`` rates)
    until the sequence is monotone — a different control flow from the
    production single-pass cascade (the isotonic solution is unique, so
    both must land on identical pools)."""
    from fractions import Fraction

    blocks = [
        {"bins": [i], "n": int(n[i]), "pos": int(pos[i])}
        for i in range(len(n))
        if n[i]
    ]
    while True:
        for i in range(len(blocks) - 1):
            r_left = Fraction(blocks[i]["pos"], blocks[i]["n"])
            r_right = Fraction(blocks[i + 1]["pos"], blocks[i + 1]["n"])
            if r_left > r_right:
                blocks[i] = {
                    "bins": blocks[i]["bins"] + blocks[i + 1]["bins"],
                    "n": blocks[i]["n"] + blocks[i + 1]["n"],
                    "pos": blocks[i]["pos"] + blocks[i + 1]["pos"],
                }
                del blocks[i + 1]
                break
        else:
            break
    rates = {}
    pools = {}
    for pid, blk in enumerate(blocks):
        for i in blk["bins"]:
            rates[i] = blk["pos"] / blk["n"]
            pools[i] = pid
    return rates, pools


def test_matches_numpy_pav(spark, sf_small, bins):
    n, pos = bins
    rates, pools = _independent_pav(n, pos)
    got = q_isotonic_calibration(spark, sf_small).collect()
    assert len(got) == sum(1 for x in n if x)
    for r in got:
        assert r["n"] == n[r["bin"]]
        assert r["raw_rate"] == round(pos[r["bin"]] / n[r["bin"]], 6)
        assert r["iso_rate"] == round(rates[r["bin"]], 6)
        assert r["pool_id"] == pools[r["bin"]]


def test_isotonic_properties(spark, sf_small, bins):
    n, pos = bins
    got = q_isotonic_calibration(spark, sf_small).collect()
    # monotone non-decreasing fit
    iso = [r["iso_rate"] for r in got]
    assert iso == sorted(iso)
    # pooling actually fired on the fixture (hash rates aren't monotone)
    assert len({r["pool_id"] for r in got}) < len(got)
    # block means preserve totals: sum(n·iso) == total positives (±rounding)
    assert sum(r["n"] * r["iso_rate"] for r in got) == pytest.approx(
        pos.sum(), abs=0.5
    )
