"""Z-order layout (operators/layout.py): key correctness and the
scan-pruning property of the clustered write."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from lexam_data_pipeline_spark.operators.layout import zorder_key, zorder_write


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = spark.range(500).select(
        (F.col("id") * 7 % 256).alias("x"), (F.col("id") * 13 % 256).alias("y")
    )
    got = rows.withColumn("z", zorder_key(F.col("x"), F.col("y"))).collect()
    for r in got:
        assert r["z"] == _morton_py(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_locality_beats_row_order(spark):
    """Sorting by the Morton key must cluster BOTH dimensions: within
    each quarter of the sorted order, the x- and y-spreads should be
    far below the full range (the property min/max pruning relies on)."""
    import random

    rnd = random.Random(7)
    data = [(rnd.randrange(256), rnd.randrange(256)) for _ in range(4000)]
    df = spark.createDataFrame(data, "x: int, y: int")
    rows = (
        df.withColumn("z", zorder_key(F.col("x"), F.col("y")))
        .orderBy("z")
        .collect()
    )
    n_chunks = 16
    size = len(rows) // n_chunks
    areas = []
    for ci in range(n_chunks):
        chunk = rows[ci * size : (ci + 1) * size]
        xs = [r["x"] for r in chunk]
        ys = [r["y"] for r in chunk]
        areas.append((max(xs) - min(xs)) * (max(ys) - min(ys)))
    # a 1/16 Z-curve chunk covers ~a 64x64 cell (possibly straddling a
    # boundary on ONE axis); an unclustered layout covers ~255*255 per
    # chunk.  Mean bounding-box area is the robust discriminator.
    mean_area = sum(areas) / len(areas)
    assert mean_area < 25000, mean_area


def test_zorder_write_produces_disjoint_file_ranges(spark, tmp_path):
    df = spark.range(2000).select(
        (F.col("id") % 251).alias("x"), ((F.col("id") * 17) % 249).alias("y")
    )
    path = str(tmp_path / "zordered")
    zorder_write(df, F.col("x"), F.col("y"), path, n_files=4)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) >= 2
    ranges = []
    for f in files:
        part = spark.read.parquet(f).withColumn(
            "z", zorder_key(F.col("x"), F.col("y"))
        )
        row = part.agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()[0]
        ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "repartitionByRange must give disjoint zkey ranges"


def test_weighted_sample_prefers_heavy_rows(spark):
    """Distributional check on ml/curation.weighted_sample: items with
    weight 8 must be selected ~8x as often as weight 1 (binomial slack
    allowed) — catches a priority formula that ignores the weight."""
    from lexam_data_pipeline_spark.ml.curation import weighted_sample

    df = spark.range(2000).select(
        F.col("id"), (1 + (F.col("id") % 2) * 7).cast("int").alias("w")
    )
    out = weighted_sample(df, F.col("w"), F.col("id"), k=400).collect()
    heavy = sum(1 for r in out if r["w"] == 8)
    light = 400 - heavy
    # expected split ~ 8:1 → ~356 heavy; require at least 5:1
    assert heavy > light * 5, (heavy, light)


def test_quantize_reconstruction_error_bounded(spark, sf_oracle):
    """|x - q*scale| < scale for every component (floor quantization),
    i.e. int8 reconstruction is within one quantization step."""
    from lexam_data_pipeline_spark.catalog import load_table
    from lexam_data_pipeline_spark.ml.quantize import quantize_embeddings

    emb = load_table(spark, sf_oracle, "embeddings").limit(50)
    qd = quantize_embeddings(emb)
    err = qd.select(
        F.array_max(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.transform("qvec", lambda q: q.cast("double") * F.col("scale")),
                lambda x, r: F.abs(x - r) / F.col("scale"),
            )
        ).alias("steps")
    ).agg(F.max("steps")).collect()[0][0]
    assert err < 1.0 + 1e-9, err


class TestReaderPruning:
    """Reader-side evidence for the layout tier (round-3 verdict item 8):
    the z-ordered layout must let a reader SKIP data, not just write
    prettily-clustered files."""

    def _table(self, spark, n=100_000):
        return spark.range(n).select(
            (F.col("id") % 251).alias("x"),
            ((F.col("id") * 7) % 241).alias("y"),
            F.col("id").alias("v"),
        )

    @staticmethod
    def _scan_metrics(df):
        """Execute df and return the leaf scan node's SQL metrics."""
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()

        def leaves(node):
            k = node.children().size()
            if k == 0:
                return [node]
            out = []
            for i in range(k):
                out += leaves(node.children().apply(i))
            return out

        for leaf in leaves(plan):
            if "Scan" in leaf.nodeName():
                m, vals, it = leaf.metrics(), {}, leaf.metrics().keys().iterator()
                while it.hasNext():
                    k = it.next()
                    vals[k] = m.apply(k).value()
                return vals
        raise AssertionError("no scan node found")

    def test_rowgroup_skipping_beats_unsorted_layout(self, spark, tmp_path):
        """Same rows, same predicate: the z-ordered files' min/max stats
        let the parquet reader emit at most ~60% of rows, while the
        unsorted control emits all of them."""
        from lexam_data_pipeline_spark.operators.layout import zorder_write

        df = self._table(spark)
        zp, up = str(tmp_path / "z"), str(tmp_path / "u")
        zorder_write(df, F.col("x"), F.col("y"), zp, n_files=8)
        df.repartition(8).write.mode("overwrite").parquet(up)
        pred = (F.col("x") >= 10) & (F.col("x") < 20)
        z_rows = self._scan_metrics(spark.read.parquet(zp).filter(pred))["numOutputRows"]
        u_rows = self._scan_metrics(spark.read.parquet(up).filter(pred))["numOutputRows"]
        n = df.count()
        assert u_rows == n  # unsorted: stats are useless, scan emits everything
        assert z_rows <= 0.6 * n  # z-ordered: whole row groups skipped

    def test_zbuckets_for_box_matches_bruteforce(self):
        from lexam_data_pipeline_spark.operators.layout import zbuckets_for_box

        bits, cell_bits = 6, 2
        for box in [(0, 5, 0, 5), (10, 40, 3, 17), (0, 63, 0, 63), (32, 32, 48, 48)]:
            x_lo, x_hi, y_lo, y_hi = box
            want = set()
            for x in range(x_lo, x_hi + 1):
                for y in range(y_lo, y_hi + 1):
                    z = 0
                    for i in range(bits):
                        z |= ((x >> i) & 1) << (2 * i)
                        z |= ((y >> i) & 1) << (2 * i + 1)
                    want.add(z >> (2 * (bits - cell_bits)))
            got = set(zbuckets_for_box(x_lo, x_hi, y_lo, y_hi, bits, cell_bits))
            assert got == want, box

    def test_bucketed_read_prunes_partitions_and_is_exact(self, spark, tmp_path):
        """The box reader must (a) list FEWER directories than the table
        has (InMemoryFileIndex pruning, visible as the plan's partition
        count) and (b) return exactly the rows a full-scan filter does."""
        from lexam_data_pipeline_spark.operators.layout import (
            read_zorder_box,
            zorder_write_bucketed,
        )

        df = self._table(spark)
        path = str(tmp_path / "zb")
        zorder_write_bucketed(df, F.col("x"), F.col("y"), path)
        box = dict(x_lo=0, x_hi=50, y_lo=0, y_hi=50)
        got = read_zorder_box(spark, path, **box)
        plan = got._jdf.queryExecution().executedPlan().toString()
        # the bucket IN-list must land in PartitionFilters (file-index
        # pruning), not in the post-scan data filters
        assert "PartitionFilters: [isnotnull(zbucket" in plan
        # and the executed scan reads strictly fewer files than the table
        # (inputFiles() reports the PRE-pruning listing, so measure the
        # physical scan's numFiles metric instead)
        n_all = self._scan_metrics(spark.read.parquet(path))["numFiles"]
        n_got = self._scan_metrics(got)["numFiles"]
        assert n_got < n_all
        # the (0..50)² box touches only the low-x/low-y cells: with
        # cell_bits=2 (4×4 grid of 64-wide cells) that is exactly cell
        # (0,0) → 1 of 16 directories
        assert n_got <= n_all // 4
        want = sorted(
            (r["x"], r["y"], r["v"])
            for r in spark.read.parquet(path)
            .filter(F.col("x").between(0, 50) & F.col("y").between(0, 50))
            .collect()
        )
        assert sorted((r["x"], r["y"], r["v"]) for r in got.collect()) == want


class TestCompaction:
    def test_plan_is_first_fit_decreasing(self, tmp_path):
        """Unit-check the bin-packing: no bin over target when every
        file fits, and the bin count is within the FFD 11/9-OPT+1
        guarantee of the byte lower bound."""
        import os

        from lexam_data_pipeline_spark.operators.layout import compaction_plan

        sizes = [700, 600, 500, 400, 300, 200, 100, 100]
        for i, s in enumerate(sizes):
            with open(os.path.join(tmp_path, f"f{i:02d}.parquet"), "wb") as fh:
                fh.write(b"\0" * s)
        # a non-parquet straggler must be ignored
        (tmp_path / "_SUCCESS").write_bytes(b"")
        plan = compaction_plan(str(tmp_path), target_bytes=1000)
        assert all(b["bytes"] <= 1000 for b in plan)
        total = sum(sizes)
        assert len(plan) <= int(11 / 9 * -(-total // 1000)) + 1
        packed = sorted(f for b in plan for f in b["files"])
        assert packed == sorted(f"f{i:02d}.parquet" for i in range(len(sizes)))

    def test_compact_preserves_rows_and_shrinks_file_count(self, spark, tmp_path):
        """20 small files in, ~plan-many out; rows byte-identical."""
        import os

        from lexam_data_pipeline_spark.operators.layout import (
            compact_small_files,
            compaction_plan,
        )

        src = str(tmp_path / "small")
        out = str(tmp_path / "big")
        df = spark.range(0, 20000).select(
            F.col("id"), (F.col("id") % 7).alias("k"), F.sha1(F.col("id").cast("string")).alias("s")
        )
        df.repartition(20).write.parquet(src)
        n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        assert n_small == 20
        total = sum(
            os.path.getsize(os.path.join(src, f))
            for f in os.listdir(src)
            if f.endswith(".parquet")
        )
        target = total // 3  # aim for ~3-4 outputs
        stats = compact_small_files(spark, src, out, target)
        assert stats["files_before"] == 20
        assert stats["files_after"] == stats["planned_bins"]
        assert stats["planned_bins"] == len(compaction_plan(src, target))
        assert stats["files_after"] < stats["files_before"]
        got = sorted(
            (r["id"], r["k"], r["s"]) for r in spark.read.parquet(out).collect()
        )
        want = sorted((r["id"], r["k"], r["s"]) for r in df.collect())
        assert got == want
