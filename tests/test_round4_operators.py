"""Round-4 operators: skyline, triangle count, SCD2 intervals, event
transitions.  Each is oracle-checked by the parity sweep; these tests pin
the SEMANTIC properties independently (brute-force twins on toy inputs,
invariants on fixture data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.plans.fixture_queries import (
    q_event_transitions,
    q_scd2_intervals,
    q_skyline_pareto,
    q_triangle_count,
)


class TestSkyline:
    def test_no_skyline_point_dominated(self, spark, sf_oracle):
        rows = q_skyline_pareto(spark, sf_oracle).collect()
        assert rows
        pts = [(round(r["price"] * 100), r["date_us"]) for r in rows]
        for i, (p1, d1) in enumerate(pts):
            for j, (p2, d2) in enumerate(pts):
                if i == j:
                    continue
                dominated = p2 <= p1 and d2 >= d1 and (p2 < p1 or d2 > d1)
                assert not dominated, (pts[i], pts[j])

    def test_matches_bruteforce_on_fixture(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table

        orders = [
            (round(r["o_totalprice"] * 100), r["date_us"], r["o_orderkey"])
            for r in load_table(spark, sf_oracle, "orders")
            .select(
                "o_orderkey",
                "o_totalprice",
                F.unix_micros("o_orderdate").alias("date_us"),
            )
            .collect()
        ]
        want = {
            k
            for p1, d1, k in orders
            if not any(
                p2 <= p1 and d2 >= d1 and (p2 < p1 or d2 > d1)
                for p2, d2, _ in orders
            )
        }
        got = {r["o_orderkey"] for r in q_skyline_pareto(spark, sf_oracle).collect()}
        assert got == want

    def test_cheapest_and_newest_always_present(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table

        o = load_table(spark, sf_oracle, "orders")
        sky = q_skyline_pareto(spark, sf_oracle)
        min_price = o.agg(F.min(F.round(F.col("o_totalprice") * 100))).collect()[0][0]
        max_date = o.agg(F.max(F.unix_micros("o_orderdate"))).collect()[0][0]
        prices = [round(r["price"] * 100) for r in sky.collect()]
        dates = [r["date_us"] for r in sky.collect()]
        assert min(prices) == min_price
        assert max(dates) == max_date


class TestTriangles:
    def _count(self, spark, edges):
        """Run the oriented-count plan on an explicit edge list via a
        temp-view substitution of the fixture query's graph build."""
        from lexam_data_pipeline_spark.plans.fixture_queries import q_triangle_count  # noqa: F401

        # brute force on driver
        es = {tuple(sorted(e)) for e in edges}
        nodes = {n for e in es for n in e}
        tri = 0
        for a in nodes:
            for b in nodes:
                for c in nodes:
                    if a < b < c:
                        if (a, b) in es and (b, c) in es and (a, c) in es:
                            tri += 1
        return tri

    def test_fixture_count_matches_bruteforce(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import TRIANGLE_TOP_K

        li = (
            load_table(spark, sf_oracle, "lineitem")
            .select("l_orderkey", "l_suppkey")
            .distinct()
        )
        support = (
            li.alias("a")
            .join(li.alias("b"), "l_orderkey")
            .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
            .groupBy(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
            .agg(F.count(F.lit(1)).alias("support"))
            .collect()
        )
        # independent driver-side mutual-top-K build
        from collections import defaultdict

        nbrs: dict[int, list] = defaultdict(list)
        for r in support:
            nbrs[r["u"]].append((-r["support"], r["v"]))
            nbrs[r["v"]].append((-r["support"], r["u"]))
        topk = {
            n: {v for _, v in sorted(lst)[:TRIANGLE_TOP_K]} for n, lst in nbrs.items()
        }
        edges = [
            (r["u"], r["v"])
            for r in support
            if r["v"] in topk[r["u"]] and r["u"] in topk[r["v"]]
        ]
        want = self._count(spark, edges)
        got = q_triangle_count(spark, sf_oracle).collect()[0]["n_triangles"]
        assert got == want and got > 0


class TestScd2:
    def test_intervals_partition_history(self, spark, sf_oracle):
        """Per user: versions are 1..k, exactly one current row, each
        interval closes where the next opens, n_events sums to the
        user's event count."""
        from lexam_data_pipeline_spark.catalog import load_table

        rows = q_scd2_intervals(spark, sf_oracle).collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        ev_counts = {
            r["user_id"]: r["n"]
            for r in load_table(spark, sf_oracle, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(by_user) == set(ev_counts)
        for uid, ivs in by_user.items():
            ivs.sort(key=lambda r: r["version"])
            assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
            assert sum(r["n_events"] for r in ivs) == ev_counts[uid]
            assert [r["is_current"] for r in ivs].count(1) == 1
            assert ivs[-1]["is_current"] == 1 and ivs[-1]["valid_to_us"] is None
            for a, b in zip(ivs, ivs[1:]):
                assert a["valid_to_us"] == b["valid_from_us"]
                assert a["event_type"] != b["event_type"]  # runs collapsed

    def test_toy_history(self, spark, tmp_path, sf_oracle):
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = str(tmp_path / "sfdir")
        os.makedirs(d)
        pdf = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00", "2024-01-01 13:00"]
                ).astype("datetime64[us]"),
                "user_id": [7, 7, 7, 7],
                "event_type": ["a", "a", "b", "a"],
                "value": [1.0] * 4,
                "props": ["{}"] * 4,
            }
        )
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, "events.parquet"))
        got = [
            (r["version"], r["event_type"], r["n_events"], r["is_current"])
            for r in sorted(q_scd2_intervals(spark, d).collect(), key=lambda r: r["version"])
        ]
        assert got == [(1, "a", 2, 0), (2, "b", 1, 0), (3, "a", 1, 1)]


class TestTransitions:
    def test_probabilities_well_formed(self, spark, sf_oracle):
        rows = q_event_transitions(spark, sf_oracle).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 < r["prob"] <= 1
            assert r["n"] <= r["from_total"]

    def test_totals_match_independent_count(self, spark, sf_oracle):
        """from_total must equal the total transitions out of from_type
        (computed independently, not via the window)."""
        from lexam_data_pipeline_spark.catalog import load_table
        from pyspark.sql import Window

        ev = load_table(spark, sf_oracle, "events").select(
            "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
        )
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        outs = {
            r["event_type"]: r["n"]
            for r in ev.withColumn("nx", F.lead("event_type").over(w))
            .filter(F.col("nx").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for r in q_event_transitions(spark, sf_oracle).collect():
            assert r["from_total"] == outs[r["from_type"]]


class TestGapFill:
    def test_spine_complete_and_no_null_revenue(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.plans.fixture_queries import q_gap_fill

        rows = q_gap_fill(spark, sf_oracle).collect()
        by_p: dict[str, list] = {}
        for r in rows:
            by_p.setdefault(r["priority"], []).append(r)
        spans = {len(v) for v in by_p.values()}
        assert len(spans) == 1  # every priority covers the identical spine
        import datetime

        for p, vs in by_p.items():
            days = sorted(datetime.date.fromisoformat(r["day"]) for r in vs)
            assert (days[-1] - days[0]).days + 1 == len(days)  # no holes
            assert len(set(days)) == len(days)  # no dupes
            for r in vs:
                assert r["revenue"] is not None

    def test_forward_fill_semantics_on_toy(self, spark, tmp_path):
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lexam_data_pipeline_spark.plans.fixture_queries import q_gap_fill

        d = str(tmp_path / "sfdir")
        os.makedirs(d)
        pdf = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_custkey": [1, 1, 1],
                "o_orderstatus": ["O"] * 3,
                "o_totalprice": [10.0, 20.0, 40.0],
                "o_orderdate": pd.to_datetime(
                    ["2024-01-01", "2024-01-01", "2024-01-04"]
                ).astype("datetime64[us]"),
                "o_orderpriority": ["1-URGENT"] * 3,
            }
        )
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(d, "orders.parquet"))
        got = {
            r["day"]: (r["revenue"], r["is_gap"])
            for r in q_gap_fill(spark, d).collect()
        }
        assert got == {
            "2024-01-01": (30.0, 0),
            "2024-01-02": (30.0, 1),   # forward-filled
            "2024-01-03": (30.0, 1),
            "2024-01-04": (40.0, 0),
        }


class TestChiSquare:
    def test_matches_bruteforce(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_chi_square

        orders = load_table(spark, sf_oracle, "orders")
        customer = load_table(spark, sf_oracle, "customer")
        cells = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment", "o_orderpriority")
            .count()
            .collect()
        )
        from collections import defaultdict

        row_n, col_n, n = defaultdict(int), defaultdict(int), 0
        for r in cells:
            row_n[r["c_mktsegment"]] += r["count"]
            col_n[r["o_orderpriority"]] += r["count"]
            n += r["count"]
        # full-grid statistic: zero-count cells contribute (0-e)^2/e = e
        observed = {
            (r["c_mktsegment"], r["o_orderpriority"]): r["count"]
            for r in cells
        }
        chi2 = 0.0
        for seg in row_n:
            for prio in col_n:
                o = observed.get((seg, prio), 0)
                e = row_n[seg] * col_n[prio] / n
                chi2 += (o - e) ** 2 / e
        got = q_chi_square(spark, sf_oracle).collect()[0]
        assert abs(got["chi2"] - chi2) < 0.01  # floor-scaling slack ≤ n_cells/1e6
        assert got["dof"] == (len(row_n) - 1) * (len(col_n) - 1)
        assert got["n"] == n

    def test_independent_data_has_small_chi2(self, spark, sf_oracle):
        """Segment and priority are generated independently in the
        fixtures, so chi2 should not scream dependence: bounded by a
        loose multiple of dof (chi2 mean = dof under H0)."""
        from lexam_data_pipeline_spark.plans.fixture_queries import q_chi_square

        got = q_chi_square(spark, sf_oracle).collect()[0]
        assert got["chi2"] < 10 * got["dof"]


class TestGraphBfs:
    def test_matches_bruteforce_bfs_on_fixture(self, spark, sf_oracle):
        """Frontier-loop hops must equal a driver-side networkx-free BFS
        over the same mutual-top-K edge set."""
        from collections import deque

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            BFS_MAX_HOPS,
            BFS_SEED_NATION,
            TRIANGLE_TOP_K,
            copurchase_mutual_topk,
            q_graph_bfs,
        )

        pairs = copurchase_mutual_topk(spark, sf_oracle, TRIANGLE_TOP_K).collect()
        adj: dict[int, set[int]] = {}
        for r in pairs:
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
        seeds = [
            r["s_suppkey"]
            for r in load_table(spark, sf_oracle, "supplier")
            .filter(F.col("s_nationkey") == BFS_SEED_NATION)
            .collect()
        ]
        dist = {s: 0 for s in seeds}
        dq = deque(seeds)
        while dq:
            n = dq.popleft()
            if dist[n] >= BFS_MAX_HOPS:
                continue
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = dist[n] + 1
                    dq.append(m)
        got = {(r["node"], r["hop"]) for r in q_graph_bfs(spark, sf_oracle).collect()}
        assert got == set(dist.items())

    @pytest.mark.slowsuite
    def test_deep_bfs_survives_checkpoint_boundaries(self, spark):
        """A 12-hop path graph crosses two CHECKPOINT_EVERY boundaries
        and must still return exact hop distances (and stop early once
        the frontier drains)."""
        from lexam_data_pipeline_spark.ml.graph import bfs_hops

        n = 12
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)],
            "src long, dst long",
        )
        seeds = spark.createDataFrame([(0,)], "node long")
        got = {
            (r["node"], r["hop"]) for r in bfs_hops(edges, seeds, 30).collect()
        }
        assert got == {(i, i) for i in range(n + 1)}


class TestSnapshotDiff:
    def test_classes_partition_the_union_of_keys(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            SNAP_ARCHIVE_BEFORE,
            SNAP_OLD_CUTOFF,
            q_snapshot_diff,
        )

        rows = {r["change_type"]: r for r in q_snapshot_diff(spark, sf_oracle).collect()}
        assert set(rows) == {"insert", "delete", "update", "unchanged"}
        orders = load_table(spark, sf_oracle, "orders")
        n_old = orders.filter(
            F.col("o_orderdate") < F.lit(SNAP_OLD_CUTOFF).cast("timestamp")
        ).count()
        n_new = orders.filter(
            ~(
                (F.col("o_orderstatus") == "F")
                & (F.col("o_orderdate") < F.lit(SNAP_ARCHIVE_BEFORE).cast("timestamp"))
            )
        ).count()
        n = {k: rows[k]["n_rows"] for k in rows}
        # old = delete + update + unchanged; new = insert + update + unchanged
        assert n_old == n["delete"] + n["update"] + n["unchanged"]
        assert n_new == n["insert"] + n["update"] + n["unchanged"]

    def test_update_class_is_exactly_open_orders_in_both(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            SNAP_OLD_CUTOFF,
            q_snapshot_diff,
        )

        rows = {r["change_type"]: r for r in q_snapshot_diff(spark, sf_oracle).collect()}
        expect = (
            load_table(spark, sf_oracle, "orders")
            .filter(
                (F.col("o_orderdate") < F.lit(SNAP_OLD_CUTOFF).cast("timestamp"))
                & (F.col("o_orderstatus") == "O")
            )
        )
        assert rows["update"]["n_rows"] == expect.count()
        assert rows["update"]["key_checksum"] == (
            expect.agg(F.sum("o_orderkey")).collect()[0][0]
        )


class TestCalibrationBins:
    def test_bins_cover_all_rows_and_gap_identity(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            CALIB_BINS,
            q_calibration_bins,
        )

        rows = q_calibration_bins(spark, sf_oracle).collect()
        assert {r["bin"] for r in rows} == set(range(CALIB_BINS))
        total = load_table(spark, sf_oracle, "orders").count()
        assert sum(r["n"] for r in rows) == total
        for r in rows:
            assert 0.0 <= r["avg_score"] <= 1.0
            assert 0.0 <= r["frac_pos"] <= 1.0
            # rounding of |a-b| vs |round(a)-round(b)| can differ by 1e-6
            assert abs(r["abs_gap"] - abs(r["avg_score"] - r["frac_pos"])) <= 2e-6

    def test_scores_are_decile_aligned(self, spark, sf_oracle):
        """Bin b's mean score must sit inside [b/10, (b+1)/10) — the
        binning and the score must agree (catches a mixed-radix bug)."""
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            CALIB_BINS,
            q_calibration_bins,
        )

        for r in q_calibration_bins(spark, sf_oracle).collect():
            lo, hi = r["bin"] / CALIB_BINS, (r["bin"] + 1) / CALIB_BINS
            assert lo <= r["avg_score"] < hi


class TestTheilSen:
    def test_matches_bruteforce_on_fixture(self, spark, sf_oracle):
        """Median-of-pairwise-slopes recomputed driver-side from the same
        monthly spine must match exactly (incl. even-count interpolation)."""
        import statistics

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            _dec_sum,
            q_theil_sen,
        )

        spine = (
            load_table(spark, sf_oracle, "orders")
            .groupBy(
                F.col("o_orderpriority").alias("prio"),
                F.date_trunc("month", "o_orderdate").alias("m"),
            )
            .agg(_dec_sum("o_totalprice").alias("rev"))
            .collect()
        )
        by_prio: dict[str, list] = {}
        for r in spine:
            by_prio.setdefault(r["prio"], []).append((r["m"], r["rev"]))
        got = {r["prio"]: (r["n_pairs"], r["sen_slope"]) for r in q_theil_sen(spark, sf_oracle).collect()}
        base = min(m for pts in by_prio.values() for m, _ in pts)
        for prio, pts in by_prio.items():
            idx = sorted(((m - base).days, rev) for m, rev in pts)
            slopes = [
                (r2 - r1) / (d2 - d1)
                for i, (d1, r1) in enumerate(idx)
                for (d2, r2) in idx[i + 1 :]
            ]
            assert got[prio][0] == len(slopes)
            assert abs(got[prio][1] - round(statistics.median(slopes), 6)) < 1e-9

    def test_robust_to_outlier_month(self, spark):
        """One wild outlier month must not drag the Sen slope (the whole
        point vs OLS): slope of a clean +10/month trend with one huge
        spike stays ~10."""
        import pandas as pd

        from lexam_data_pipeline_spark.plans.fixture_queries import q_theil_sen

        rows = []
        for i in range(24):
            val = 1000.0 + 10.0 * i * 30  # ~10/day trend on month spine
            if i == 12:
                val = 1e7  # outlier month
            rows.append((i, f"1995-{(i % 12) + 1:02d}-01", val))
        pdf = pd.DataFrame(
            {
                "o_orderkey": range(24),
                "o_custkey": [1] * 24,
                "o_orderstatus": ["F"] * 24,
                "o_totalprice": [r[2] for r in rows],
                "o_orderdate": pd.to_datetime(
                    [f"{1995 + i // 12}-{(i % 12) + 1:02d}-01" for i in range(24)]
                ).astype("datetime64[us]"),
                "o_orderpriority": ["1-URGENT"] * 24,
            }
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(pdf).write.parquet(f"{d}/orders.parquet")
            out = q_theil_sen(spark, d).collect()
        assert len(out) == 1
        # clean pairwise slope ≈ 300/30.44 days ≈ 9.86/day; outlier would
        # push an OLS fit far higher — Sen must stay near the clean trend
        assert 8.0 < out[0]["sen_slope"] < 12.0


class TestEngagement:
    def test_running_distinct_curve_invariants(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_running_distinct

        rows = sorted(
            q_running_distinct(spark, sf_oracle).collect(), key=lambda r: r["day"]
        )
        assert rows
        # monotone cumulative; final value == total distinct users
        cum = 0
        for r in rows:
            cum += r["new_users"]
            assert r["cumulative_users"] == cum
        total = (
            load_table(spark, sf_oracle, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        assert rows[-1]["cumulative_users"] == total

    def test_stickiness_bounded_and_exact_on_toy(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_dau_wau_stickiness,
        )

        for r in q_dau_wau_stickiness(spark, sf_oracle).collect():
            # avg DAU can't exceed WAU; every weekly-active user is
            # active ≥ 1 day so stickiness ≥ 1/7
            assert 1.0 / 7 - 1e-9 <= r["stickiness"] <= 1.0 + 1e-9


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, iso_ts, event_type)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sfdir")
    os.makedirs(d, exist_ok=True)
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows]).astype("datetime64[us]"),
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    return d


class TestPeakConcurrency:
    def test_carry_in_across_midnight_on_toy(self, spark, tmp_path):
        """A session open since the previous day must raise the next
        day's peak even though no interval STARTS that day — the bug a
        naive per-day recount would have."""
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_peak_concurrency,
        )

        d = _write_events(
            tmp_path,
            [
                # user 1: one session 23:00 -> 01:00 (gaps < 30 min)
                (1, 1, "2024-01-01 23:00:00", "view"),
                (2, 1, "2024-01-01 23:25:00", "click"),
                (3, 1, "2024-01-01 23:50:00", "click"),
                (4, 1, "2024-01-02 00:15:00", "click"),
                (5, 1, "2024-01-02 00:40:00", "click"),
                (6, 1, "2024-01-02 01:00:00", "purchase"),
                # user 2: session fully inside day 2, overlapping user 1
                (7, 2, "2024-01-02 00:30:00", "view"),
                (8, 2, "2024-01-02 00:45:00", "purchase"),
                # user 3: lone event on day 1 (zero-length interval)
                (9, 3, "2024-01-01 12:00:00", "view"),
            ],
        )
        got = {
            r["day"].date().isoformat(): r["peak_concurrent"]
            for r in q_peak_concurrency(spark, d).collect()
        }
        assert got == {"2024-01-01": 1, "2024-01-02": 2}

    def test_matches_pure_python_sweep(self, spark, sf_oracle):
        """Exact parity with an independent in-memory sweep line over
        the same 30-minute-gap sessions."""
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_peak_concurrency,
        )

        ev = sorted(
            (r["user_id"], r["ts"])
            for r in load_table(spark, sf_oracle, "events")
            .select("user_id", "ts")
            .collect()
        )
        by_user = defaultdict(list)
        for u, ts in ev:
            by_user[u].append(ts)
        deltas = []
        for u, tss in by_user.items():
            tss.sort()
            start = prev = tss[0]
            for t in tss[1:]:
                if (t - prev).total_seconds() > 1800:
                    deltas += [(start, 1), (prev, -1)]
                    start = t
                prev = t
            deltas += [(start, 1), (prev, -1)]
        # starts before ends at equal instants
        deltas.sort(key=lambda x: (x[0], -x[1]))
        lvl = 0
        day_peak: dict[str, int] = {}
        for ts, dl in deltas:
            lvl += dl
            k = ts.date().isoformat()
            day_peak[k] = max(day_peak.get(k, -(10**9)), lvl)
        got = {
            r["day"].date().isoformat(): r["peak_concurrent"]
            for r in q_peak_concurrency(spark, sf_oracle).collect()
        }
        assert got == day_peak

    def test_no_full_data_single_partition_sort(self, spark, sf_small):
        """The only SinglePartition exchange allowed is the tiny
        day-spine carry-in window — the full delta stream must flow
        through partitioned (per-day) windows."""
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_peak_concurrency,
        )

        plan = (
            q_peak_concurrency(spark, sf_small)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange SinglePartition") <= 1, plan


class TestEventPattern:
    def test_regex_counts_on_toy(self, spark, tmp_path):
        from lexam_data_pipeline_spark.plans.fixture_queries import q_event_pattern

        d = _write_events(
            tmp_path,
            [
                # user 1: v c p v p  -> "vcp" + "vp" = 2 matches
                (1, 1, "2024-01-01 10:00:00", "view"),
                (2, 1, "2024-01-01 10:01:00", "click"),
                (3, 1, "2024-01-01 10:02:00", "purchase"),
                (4, 1, "2024-01-01 10:03:00", "view"),
                (5, 1, "2024-01-01 10:04:00", "purchase"),
                # user 2: p v c c e -> no purchase after the view = 0
                (6, 2, "2024-01-01 11:00:00", "purchase"),
                (7, 2, "2024-01-01 11:01:00", "view"),
                (8, 2, "2024-01-01 11:02:00", "click"),
                (9, 2, "2024-01-01 11:03:00", "click"),
                (10, 2, "2024-01-01 11:04:00", "error"),
                # user 3: v s p -> signup breaks the [ce]* interior = 0
                (11, 3, "2024-01-01 12:00:00", "view"),
                (12, 3, "2024-01-01 12:01:00", "signup"),
                (13, 3, "2024-01-01 12:02:00", "purchase"),
            ],
        )
        row = q_event_pattern(spark, d).collect()[0]
        assert row["n_users"] == 3
        assert row["users_matched"] == 1
        assert row["total_matches"] == 2
        assert row["max_matches_per_user"] == 2
        assert abs(row["match_rate"] - 0.3333) < 1e-9

    def test_matches_python_re(self, spark, sf_oracle):
        """Spark's regexp_count must agree with Python re.findall on the
        identically-ordered code strings."""
        import re
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_event_pattern

        code = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
        per_user = defaultdict(list)
        for r in (
            load_table(spark, sf_oracle, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        ):
            per_user[r["user_id"]].append(
                (r["ts"], r["event_id"], code.get(r["event_type"], "e"))
            )
        counts = [
            len(re.findall("v[ce]*p", "".join(c for _, _, c in sorted(evs))))
            for evs in per_user.values()
        ]
        row = q_event_pattern(spark, sf_oracle).collect()[0]
        assert row["n_users"] == len(counts)
        assert row["total_matches"] == sum(counts)
        assert row["users_matched"] == sum(1 for c in counts if c > 0)
        assert row["max_matches_per_user"] == max(counts)


class TestUserStreaks:
    def test_streaks_on_toy(self, spark, tmp_path):
        from lexam_data_pipeline_spark.plans.fixture_queries import q_user_streaks

        d = _write_events(
            tmp_path,
            [
                # user 1 active on days 1,2,3 then 7,8 -> best streak 3
                (1, 1, "2024-01-01 10:00:00", "view"),
                (2, 1, "2024-01-02 10:00:00", "view"),
                (3, 1, "2024-01-03 10:00:00", "view"),
                (4, 1, "2024-01-07 10:00:00", "view"),
                (5, 1, "2024-01-08 10:00:00", "view"),
                # second event same day must not double-count the day
                (6, 1, "2024-01-08 11:00:00", "click"),
                # user 2: a single active day -> streak 1
                (7, 2, "2024-01-05 09:00:00", "view"),
            ],
        )
        got = {
            r["streak_days"]: r["n_users"]
            for r in q_user_streaks(spark, d).collect()
        }
        assert got == {3: 1, 1: 1}

    def test_matches_python_recount(self, spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_user_streaks

        by_user = defaultdict(set)
        for r in (
            load_table(spark, sf_oracle, "events")
            .select("user_id", F.to_date("ts").alias("d"))
            .collect()
        ):
            by_user[r["user_id"]].add(r["d"])
        dist = defaultdict(int)
        for days in by_user.values():
            ds = sorted(days)
            best = run = 1
            for a, b in zip(ds, ds[1:]):
                run = run + 1 if (b - a).days == 1 else 1
                best = max(best, run)
            dist[best] += 1
        got = {
            r["streak_days"]: r["n_users"]
            for r in q_user_streaks(spark, sf_oracle).collect()
        }
        assert got == dict(dist)
        assert sum(got.values()) == len(by_user)


class TestGiniRevenue:
    def test_matches_pure_python_gini(self, spark, sf_oracle):
        """Exact parity with an independent in-memory rank-formula Gini
        over the same integer-cents revenue."""
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_gini_revenue

        orders = load_table(spark, sf_oracle, "orders")
        cust = {
            r["c_custkey"]: r["c_mktsegment"]
            for r in load_table(spark, sf_oracle, "customer")
            .select("c_custkey", "c_mktsegment")
            .collect()
        }
        cents = defaultdict(int)
        for r in orders.select("o_custkey", "o_totalprice").collect():
            cents[r["o_custkey"]] += round(r["o_totalprice"] * 100)
        by_seg = defaultdict(list)
        for ck, c in cents.items():
            if ck in cust:
                by_seg[cust[ck]].append(c)
        want = {}
        for seg, xs in by_seg.items():
            xs.sort()
            n, sx = len(xs), sum(xs)
            six = sum((i + 1) * x for i, x in enumerate(xs))
            want[seg] = round(2.0 * six / (n * sx) - (n + 1.0) / n, 6)
        got = {
            r["c_mktsegment"]: r["gini"]
            for r in q_gini_revenue(spark, sf_oracle).collect()
        }
        assert got == want

    def test_equal_and_concentrated_toys(self, spark, tmp_path):
        """All-equal revenue => Gini 0; one customer owning ~everything
        => Gini -> (n-1)/n (the rank-formula extremes)."""
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lexam_data_pipeline_spark.plans.fixture_queries import q_gini_revenue

        d = str(tmp_path / "sfdir")
        os.makedirs(d)
        # segment EQ: 4 customers x 100.00; segment CONC: 9 x 0.01 + 1 x 9999.99
        cust = pd.DataFrame(
            {
                "c_custkey": list(range(1, 15)),
                "c_name": [f"c{i}" for i in range(1, 15)],
                "c_mktsegment": ["EQ"] * 4 + ["CONC"] * 10,
                "c_nationkey": [0] * 14,
                "c_acctbal": [0.0] * 14,
            }
        )
        prices = [100.0] * 4 + [0.01] * 9 + [9999.99]
        orders = pd.DataFrame(
            {
                "o_orderkey": list(range(1, 15)),
                "o_custkey": list(range(1, 15)),
                "o_totalprice": prices,
                "o_orderstatus": ["F"] * 14,
                "o_orderdate": pd.to_datetime(["2024-01-01"] * 14),
            }
        )
        for name, pdf in (("customer", cust), ("orders", orders)):
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                os.path.join(d, f"{name}.parquet"),
            )
        got = {r["c_mktsegment"]: r for r in q_gini_revenue(spark, d).collect()}
        assert got["EQ"]["gini"] == 0.0
        assert got["EQ"]["n_customers"] == 4
        # exact rank-formula value for the CONC vector
        xs = sorted(round(p * 100) for p in prices[4:])
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        assert got["CONC"]["gini"] == round(2.0 * six / (n * sx) - (n + 1.0) / n, 6)
        assert got["CONC"]["gini"] > 0.89


class TestTopPaths:
    def test_matches_python_recount(self, spark, sf_oracle):
        """Top-20 five-step session prefixes must match an independent
        sessionizer + Counter, including the (count desc, path asc)
        tiebreak."""
        from collections import Counter, defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_top_paths

        code = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
        by_user = defaultdict(list)
        for r in (
            load_table(spark, sf_oracle, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        ):
            by_user[r["user_id"]].append(
                (r["ts"], r["event_id"], code.get(r["event_type"], "e"))
            )
        paths = Counter()
        for evs in by_user.values():
            evs.sort()
            sess = [[evs[0]]]
            for prev, cur in zip(evs, evs[1:]):
                if (cur[0] - prev[0]).total_seconds() > 1800:
                    sess.append([])
                sess[-1].append(cur)
            for s in sess:
                paths[">".join(c for _, _, c in s[:5])] += 1
        want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = [
            (r["path"], r["n_sessions"]) for r in q_top_paths(spark, sf_oracle).collect()
        ]
        assert got == want

    def test_prefix_bounded_at_five(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.plans.fixture_queries import q_top_paths

        rows = q_top_paths(spark, sf_oracle).collect()
        assert 0 < len(rows) <= 20
        assert all(1 <= len(r["path"].split(">")) <= 5 for r in rows)
        counts = [r["n_sessions"] for r in rows]
        assert counts == sorted(counts, reverse=True)


class TestHllIntersection:
    def test_estimates_within_hll_error_of_exact(self, spark, sf_oracle):
        """Every sketch estimate must land within the lg_k=14 HLL error
        envelope (~0.8% relative, 3 sigma ~ 2.5%) of the exact distinct
        count; the differenced intersection gets the summed bound."""
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_hll_intersection,
        )

        users = defaultdict(set)
        for r in (
            load_table(spark, sf_oracle, "events")
            .select("user_id", "event_type")
            .collect()
        ):
            users[r["event_type"]].add(r["user_id"])
        rows = q_hll_intersection(spark, sf_oracle).collect()
        assert [(r["type_a"], r["type_b"]) for r in rows] == [
            ("click", "purchase"),
            ("view", "click"),
            ("view", "purchase"),
        ]
        rel = 0.025  # 3 sigma at lg_k=14
        for r in rows:
            a, b = users[r["type_a"]], users[r["type_b"]]
            for est, exact in (
                (r["est_a"], len(a)),
                (r["est_b"], len(b)),
                (r["est_union"], len(a | b)),
            ):
                assert abs(est - exact) <= max(1, rel * exact), (r, exact)
            # intersection inherits the union of the three error bars
            bound = max(3, 3 * rel * len(a | b))
            assert abs(r["est_intersection"] - len(a & b)) <= bound, r
            # inclusion-exclusion must hold exactly on the output columns
            assert r["est_intersection"] == r["est_a"] + r["est_b"] - r["est_union"]


class TestNewVsReturning:
    def test_matches_python_recount(self, spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_new_vs_returning,
        )

        active = {
            (r["ts"].date(), r["user_id"])
            for r in load_table(spark, sf_oracle, "events")
            .select("ts", "user_id")
            .collect()
        }
        first = {}
        for day, u in sorted(active):
            first.setdefault(u, day)
        want = defaultdict(lambda: [0, 0])
        for day, u in active:
            want[day][0 if first[u] == day else 1] += 1
        got = {
            r["day"].date(): (r["n_new"], r["n_returning"], r["pct_new"])
            for r in q_new_vs_returning(spark, sf_oracle).collect()
        }
        assert set(got) == set(want)
        for day, (n_new, n_ret) in want.items():
            gn, gr, pct = got[day]
            assert (gn, gr) == (n_new, n_ret), day
            assert pct == round(n_new / (n_new + n_ret), 6)

    def test_new_users_telescope_to_total(self, spark, sf_oracle):
        """Σ n_new over all days must equal the total distinct-user
        count — each user is 'new' exactly once."""
        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_new_vs_returning,
        )

        total = (
            load_table(spark, sf_oracle, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        rows = q_new_vs_returning(spark, sf_oracle).collect()
        assert sum(r["n_new"] for r in rows) == total
        first_day = min(r["day"] for r in rows)
        assert next(
            r["n_returning"] for r in rows if r["day"] == first_day
        ) == 0


class TestLtvCohort:
    def test_matches_python_recount(self, spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_customer_ltv_cohort,
        )

        by_month = defaultdict(int)
        for r in (
            load_table(spark, sf_oracle, "orders")
            .select("o_custkey", "o_orderdate", "o_totalprice")
            .collect()
        ):
            m = (r["o_orderdate"].year, r["o_orderdate"].month)
            by_month[(r["o_custkey"], m)] += round(r["o_totalprice"] * 100)
        first = {}
        for (ck, m), _ in sorted(by_month.items()):
            first.setdefault(ck, m)
        sized = defaultdict(int)
        for ck, m in first.items():
            sized[m] += 1
        aged = defaultdict(int)
        for (ck, m), cents in by_month.items():
            c = first[ck]
            aged[(c, (m[0] - c[0]) * 12 + (m[1] - c[1]))] += cents
        # cum over SEEN ages only must telescope like the window (ages
        # can be sparse; the window sums rows, not calendar months)
        cum = {}
        run = defaultdict(int)
        for (c, age) in sorted(aged):
            run[c] += aged[(c, age)]
            cum[(c, age)] = run[c]
        got = q_customer_ltv_cohort(spark, sf_oracle).collect()
        assert len(got) == len(aged)
        for r in got:
            key = ((r["cohort_month"].year, r["cohort_month"].month), r["month_age"])
            assert r["n_customers"] == sized[key[0]]
            assert round(r["cohort_revenue"] * 100) == aged[key]
            assert r["cum_ltv_per_customer"] == round(
                cum[key] / 100.0 / sized[key[0]], 6
            )

    def test_curves_monotone_and_age_zero_complete(self, spark, sf_oracle):
        """Every cohort starts at age 0 (its own first month) and its
        cumulative LTV never decreases."""
        from collections import defaultdict

        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_customer_ltv_cohort,
        )

        curves = defaultdict(list)
        for r in q_customer_ltv_cohort(spark, sf_oracle).collect():
            curves[r["cohort_month"]].append((r["month_age"], r["cum_ltv_per_customer"]))
        for c, pts in curves.items():
            pts.sort()
            assert pts[0][0] == 0, c
            vals = [v for _, v in pts]
            assert vals == sorted(vals), c


class TestLorenzDeciles:
    @staticmethod
    def _python_lorenz(spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table

        cents = defaultdict(int)
        for r in (
            load_table(spark, sf_oracle, "orders")
            .select("o_custkey", "o_totalprice")
            .collect()
        ):
            cents[r["o_custkey"]] += round(r["o_totalprice"] * 100)
        seg = {
            r["c_custkey"]: r["c_mktsegment"]
            for r in load_table(spark, sf_oracle, "customer").collect()
        }
        by_seg = defaultdict(list)
        for ck, c in cents.items():
            if ck in seg:
                by_seg[seg[ck]].append((c, ck))
        out = {}
        for s, xs in by_seg.items():
            xs.sort()
            n = len(xs)
            q, rem = divmod(n, 10)
            buckets = defaultdict(lambda: [0, 0])
            i = 0
            for d in range(1, 11):
                size = q + (1 if d <= rem else 0)
                for c, _ in xs[i : i + size]:
                    buckets[d][0] += 1
                    buckets[d][1] += c
                i += size
            total = sum(c for c, _ in xs)
            run = 0
            for d in range(1, 11):
                run += buckets[d][1]
                out[(s, d)] = (
                    buckets[d][0],
                    buckets[d][1],
                    round(buckets[d][1] / total, 6),
                    round(run / total, 6),
                )
        return out

    def test_matches_python_ntile_emulation(self, spark, sf_oracle):
        from lexam_data_pipeline_spark.plans.fixture_queries import q_lorenz_deciles

        want = self._python_lorenz(spark, sf_oracle)
        got = q_lorenz_deciles(spark, sf_oracle).collect()
        assert len(got) == len(want)
        for r in got:
            n, cents, share, cum = want[(r["c_mktsegment"], r["decile"])]
            assert r["n_customers"] == n
            assert round(r["revenue"] * 100) == cents
            assert r["share"] == share
            assert r["cum_share"] == cum

    def test_curve_is_convex_and_ends_at_one(self, spark, sf_oracle):
        """Lorenz invariants: per segment, shares are nondecreasing in
        decile (revenue-sorted assignment), cum_share ends at 1."""
        from collections import defaultdict

        from lexam_data_pipeline_spark.plans.fixture_queries import q_lorenz_deciles

        by_seg = defaultdict(list)
        for r in q_lorenz_deciles(spark, sf_oracle).collect():
            by_seg[r["c_mktsegment"]].append((r["decile"], r["share"], r["cum_share"]))
        for s, rows in by_seg.items():
            rows.sort()
            assert [d for d, _, _ in rows] == list(range(1, 11)), s
            shares = [sh for _, sh, _ in rows]
            # sorted-ascending assignment: later deciles own >= revenue
            # (allow rounding wiggle at 1e-6)
            assert all(b >= a - 1e-6 for a, b in zip(shares, shares[1:])), s
            assert rows[-1][2] == 1.0, s


class TestSessionStats:
    def test_boundary_exact_30min_stays_in_session(self, spark, tmp_path):
        """A gap of exactly 30:00 must NOT split the session (probed
        session_window rule, same as the lag-gap > idiom)."""
        from lexam_data_pipeline_spark.plans.fixture_queries import q_session_stats

        d = _write_events(
            tmp_path,
            [
                (1, 1, "2024-01-01 00:00:00", "view"),
                (2, 1, "2024-01-01 00:30:00", "click"),   # exactly 30:00
                (3, 2, "2024-01-01 00:00:00", "view"),
                (4, 2, "2024-01-01 00:30:01", "click"),   # 30:01 -> splits
            ],
        )
        got = {
            r["dur_bucket_min"]: (r["n_sessions"], r["total_events"])
            for r in q_session_stats(spark, d).collect()
        }
        # user 1: one 30-min session (bucket 30); user 2: two 0-length
        # sessions (bucket 0)
        assert got == {30: (1, 2), 0: (2, 2)}

    def test_matches_python_recount(self, spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_session_stats

        by_user = defaultdict(list)
        for r in (
            load_table(spark, sf_oracle, "events").select("user_id", "ts").collect()
        ):
            by_user[r["user_id"]].append(r["ts"])
        hist = defaultdict(lambda: [0, 0, 0])
        for tss in by_user.values():
            tss.sort()
            sessions = [[tss[0]]]
            for prev, cur in zip(tss, tss[1:]):
                if (cur - prev).total_seconds() > 1800:
                    sessions.append([])
                sessions[-1].append(cur)
            for s in sessions:
                dur_us = int((s[-1] - s[0]).total_seconds() * 1e6)
                b = min((dur_us // 600000000) * 10, 60)
                hist[b][0] += 1
                hist[b][1] += len(s)
                hist[b][2] = max(hist[b][2], len(s))
        got = {
            r["dur_bucket_min"]: (
                r["n_sessions"],
                r["total_events"],
                r["max_events"],
                r["avg_events"],
            )
            for r in q_session_stats(spark, sf_oracle).collect()
        }
        assert set(got) == set(hist)
        for b, (n, tot, mx) in hist.items():
            assert got[b][:3] == (n, tot, mx), b
            assert got[b][3] == round(tot / n, 6)

    def test_count_equals_collect_under_aggregate_pruning(self, spark, sf_oracle):
        """Regression for the probed Spark 4.1.2 hazard: a derived
        ``df.count()`` prunes every aggregate output, and if the bucket
        were derived from the session_window STRUCT Catalyst would
        eliminate the session aggregate and rebuild windows per-row
        (count collapses to 1).  Deriving from min/max aggregates keeps
        the aggregate non-eliminable."""
        from lexam_data_pipeline_spark.plans.fixture_queries import q_session_stats

        df = q_session_stats(spark, sf_oracle)
        assert df.count() == len(df.collect())


class TestWindowFunnel:
    def test_toy_levels(self, spark, tmp_path):
        """Pin the chain rule: strict ordering, 1-hour budget from the
        OPENING view, later views can out-run earlier ones."""
        from lexam_data_pipeline_spark.plans.fixture_queries import q_window_funnel

        d = _write_events(
            tmp_path,
            [
                # user 1: full chain inside the hour -> 3
                (1, 1, "2024-01-01 10:00:00", "view"),
                (2, 1, "2024-01-01 10:20:00", "click"),
                (3, 1, "2024-01-01 10:40:00", "purchase"),
                # user 2: purchase drifts past the hour -> 2
                (4, 2, "2024-01-01 10:00:00", "view"),
                (5, 2, "2024-01-01 10:30:00", "click"),
                (6, 2, "2024-01-01 11:30:00", "purchase"),
                # user 3: purchase BEFORE the click -> 2 (strict order)
                (7, 3, "2024-01-01 10:00:00", "view"),
                (8, 3, "2024-01-01 10:05:00", "purchase"),
                (9, 3, "2024-01-01 10:30:00", "click"),
                # user 4: first view too early, SECOND view completes -> 3
                (10, 4, "2024-01-01 08:00:00", "view"),
                (11, 4, "2024-01-01 10:00:00", "view"),
                (12, 4, "2024-01-01 10:10:00", "click"),
                (13, 4, "2024-01-01 10:20:00", "purchase"),
                # user 5: clicks only, never viewed -> 0
                (14, 5, "2024-01-01 10:00:00", "click"),
                # user 6: view only -> 1
                (15, 6, "2024-01-01 10:00:00", "view"),
            ],
        )
        got = {
            r["funnel_level"]: r["n_users"]
            for r in q_window_funnel(spark, d).collect()
        }
        assert got == {0: 1, 1: 1, 2: 2, 3: 2}

    def test_matches_python_recount(self, spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import q_window_funnel

        HOUR = 3_600_000_000
        evs = defaultdict(lambda: defaultdict(list))
        for r in (
            load_table(spark, sf_oracle, "events")
            .select("user_id", "event_type", F.unix_micros("ts").alias("t"))
            .collect()
        ):
            evs[r["user_id"]][r["event_type"]].append(r["t"])
        hist = defaultdict(int)
        for u, by_type in evs.items():
            views = sorted(by_type.get("view", []))
            clicks = sorted(by_type.get("click", []))
            purchases = sorted(by_type.get("purchase", []))
            best = 0
            for v in views:
                lvl = 1
                cs = [c for c in clicks if v < c <= v + HOUR]
                if cs:
                    lvl = 2
                    c0 = min(cs)
                    if any(c0 < p <= v + HOUR for p in purchases):
                        lvl = 3
                best = max(best, lvl)
            hist[best] += 1
        got = {
            r["funnel_level"]: r["n_users"]
            for r in q_window_funnel(spark, sf_oracle).collect()
        }
        assert got == dict(hist)


class TestAbandonedCarts:
    def test_matches_python_recount(self, spark, sf_oracle):
        from collections import defaultdict

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            q_abandoned_carts,
        )

        by_user = defaultdict(list)
        for r in (
            load_table(spark, sf_oracle, "events")
            .select("user_id", "ts", "event_type", "value")
            .collect()
        ):
            by_user[r["user_id"]].append((r["ts"], r["event_type"], r["value"]))
        n_ab = n_conv = cents_at_risk = 0
        for evs in by_user.values():
            evs.sort()
            sessions = [[evs[0]]]
            for prev, cur in zip(evs, evs[1:]):
                if (cur[0] - prev[0]).total_seconds() > 1800:
                    sessions.append([])
                sessions[-1].append(cur)
            for s in sessions:
                types = {t for _, t, _ in s}
                if "click" not in types:
                    continue
                cents = sum(round(v * 100) for _, t, v in s if t == "click")
                if "purchase" in types:
                    n_conv += 1
                else:
                    n_ab += 1
                    cents_at_risk += cents
        r = q_abandoned_carts(spark, sf_oracle).collect()[0]
        assert (r["n_abandoned"], r["n_converted"]) == (n_ab, n_conv)
        assert r["abandonment_rate"] == round(n_ab / (n_ab + n_conv), 6)
        assert round(r["value_at_risk"] * 100) == cents_at_risk


class TestTableProfile:
    def test_matches_pandas_profile(self, spark, sf_oracle):
        import pandas as pd  # noqa: F401

        from lexam_data_pipeline_spark.catalog import load_table
        from lexam_data_pipeline_spark.plans.fixture_queries import (
            PROFILE_COLUMNS,
            q_table_profile,
        )

        pdf = load_table(spark, sf_oracle, "orders").toPandas()
        got = {r["column"]: r for r in q_table_profile(spark, sf_oracle).collect()}
        assert set(got) == set(PROFILE_COLUMNS)
        for c in PROFILE_COLUMNS:
            r = got[c]
            assert r["n_rows"] == len(pdf)
            assert r["n_nulls"] == int(pdf[c].isna().sum())
            assert r["n_distinct"] == int(pdf[c].nunique())
            assert r["min_value"] == str(pdf[c].min())
            assert r["max_value"] == str(pdf[c].max())
