"""Versioned snapshot tables (sources/snapshots.py): atomic commits,
time travel, MVCC isolation, CDC diffs, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.sources.snapshots import SnapshotConflict, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


class TestSnapshotTable:
    def test_write_read_roundtrip(self, spark, table):
        v = table.write(_df(spark, [(1, "a"), (2, "b")]))
        assert v == 0
        assert sorted(r["val"] for r in table.read().collect()) == ["a", "b"]

    def test_append_reuses_prior_files(self, spark, table):
        table.write(_df(spark, [(1, "a")]))
        v1 = table.write(_df(spark, [(2, "b")]), mode="append")
        assert v1 == 1
        assert table.read().count() == 2
        # append must reference, never rewrite: v1's manifest holds v0's dir
        m0, m1 = table._manifest(0), table._manifest(1)
        assert m0["dirs"][0] in m1["dirs"]

    def test_time_travel_and_mvcc_isolation(self, spark, table):
        table.write(_df(spark, [(1, "a"), (2, "b")]))
        old_reader = table.read(0)  # plan resolved against v0
        table.delete_where(F.col("id") == 1)
        assert table.read().count() == 1  # latest sees the delete
        assert table.read(0).count() == 2  # time travel
        assert old_reader.count() == 2  # in-flight reader unaffected

    def test_delete_where_creates_new_version(self, spark, table):
        table.write(_df(spark, [(i, "x") for i in range(10)]))
        v = table.delete_where(F.col("id") >= 5)
        assert v == 1
        assert table.read().count() == 5
        assert {r["id"] for r in table.read().collect()} == set(range(5))

    def test_upsert_merges_by_key(self, spark, table):
        table.write(_df(spark, [(1, "a"), (2, "b")]))
        table.upsert(_df(spark, [(2, "B"), (3, "c")]), key="id")
        got = {r["id"]: r["val"] for r in table.read().collect()}
        assert got == {1: "a", 2: "B", 3: "c"}

    def test_changes_reports_insert_and_delete(self, spark, table):
        table.write(_df(spark, [(1, "a"), (2, "b")]))
        table.write(_df(spark, [(2, "B"), (3, "c")]))  # update 2, del 1, ins 3
        diff = {
            (r["id"], r["val"], r["_change"])
            for r in table.changes(0, 1).collect()
        }
        assert diff == {
            (1, "a", "delete"),
            (2, "b", "delete"),
            (2, "B", "insert"),
            (3, "c", "insert"),
        }

    def test_conflicting_commit_raises(self, spark, table):
        table.write(_df(spark, [(1, "a")]))
        # simulate a racing writer: pre-create the next version's manifest
        race = table._manifest_path(1)
        with open(race, "w") as f:
            f.write("{}")
        with pytest.raises(SnapshotConflict):
            table._commit(1, ["data/doesnotexist"], "overwrite")

    def test_vacuum_drops_unreferenced_dirs(self, spark, table):
        table.write(_df(spark, [(1, "a")]))
        table.write(_df(spark, [(2, "b")]))  # overwrite → v0's dir unreferenced
        removed = table.vacuum(keep_last=1)
        assert len(removed) == 1
        assert table.read().count() == 1  # latest still reads fine
        assert table.versions() == [1]
        with pytest.raises(FileNotFoundError):
            table._manifest(0)

    def test_read_empty_table_raises(self, spark, table):
        with pytest.raises(FileNotFoundError):
            table.read()

    def test_experiment_shape_cascade(self, spark, tmp_path):
        """Reference cascade delete (routers/experiments.py:130-137) over
        snapshot tables: deleting an experiment rewrites answers and
        judgments as new versions; history keeps the pre-delete state."""
        answers = SnapshotTable(spark, str(tmp_path / "answers"))
        judgments = SnapshotTable(spark, str(tmp_path / "judgments"))
        answers.write(
            spark.createDataFrame(
                [(1, 10), (2, 10), (3, 11)], "answer_id long, experiment_id long"
            )
        )
        judgments.write(
            spark.createDataFrame([(1, 1), (2, 3)], "judgment_id long, answer_id long")
        )
        doomed = answers.read().filter(F.col("experiment_id") == 10)
        answers.delete_where(F.col("experiment_id") == 10)
        judgments.write(
            judgments.read().join(doomed, "answer_id", "left_anti").select(
                "judgment_id", "answer_id"
            ),
            mode="overwrite",
        )
        assert answers.read().count() == 1
        assert judgments.read().count() == 1
        assert judgments.read().collect()[0]["answer_id"] == 3
        assert answers.read(0).count() == 3  # pre-delete state retained
