"""Versioned snapshot tables: atomic commits, time travel, CDC diffs.

The reference mutates tables in place under Postgres MVCC (row appends
at services/generation.py:120-121, predicate deletes at
routers/generation.py:78-80, cascade deletes at routers/experiments.py:
130-137).  Plain parquet directories can't reproduce that safely: an
overwrite is non-atomic (readers see partial state) and destroys
history.  This module is the Spark-native answer — a Delta-lite
manifest layout built only on parquet + JSON:

* every write lands data files in a fresh ``data/<version>-<uuid>/``
  directory, then commits by writing ``_versions/v<N>.json`` — readers
  resolve the table through the manifest, so a version is visible only
  after its single manifest write (the atomic commit point);
* committed versions are immutable → **time travel** (``read(version=)``)
  and safe concurrent readers come free, exactly Postgres-MVCC-style;
* writer concurrency is optimistic: the commit fails if the target
  version file already exists (the Spark analog of the reference's 409
  concurrency guard, routers/generation.py:18-19);
* ``changes(v0, v1)`` derives a CDC row-diff between versions with two
  hash anti-joins — the feed for downstream incremental maintenance
  (operators/incremental.py);
* ``vacuum`` unlinks data directories no manifest references.

100 TB notes: a manifest lists file paths, not rows — commit cost is
O(files in the new version), independent of table size.  ``append``
reuses prior versions' files by reference (no copy, no rewrite).
``delete_where``/``upsert`` rewrite only via a full declarative plan,
so Catalyst pushes the retained-predicate to the parquet scan; at
cluster scale you'd partition the data dirs so the rewrite touches only
affected partitions.  Readers pay one small JSON read, then a plain
multi-path parquet scan with normal pushdown/pruning.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession

MANIFEST_DIR = "_versions"


class SnapshotConflict(RuntimeError):
    """Another writer committed this version first (optimistic check)."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, MANIFEST_DIR), exist_ok=True)

    # -- version bookkeeping ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, MANIFEST_DIR, f"v{version}.json")

    def versions(self) -> list[int]:
        d = os.path.join(self.path, MANIFEST_DIR)
        out = []
        for name in os.listdir(d):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # -- write path ---------------------------------------------------------

    def _write_files(self, df: DataFrame) -> str:
        rel = f"data/{uuid.uuid4().hex[:12]}"
        df.write.mode("error").parquet(os.path.join(self.path, rel))
        return rel

    def _commit(self, version: int, dirs: list[str], op: str) -> int:
        target = self._manifest_path(version)
        manifest = json.dumps({"version": version, "op": op, "dirs": dirs})
        try:
            # O_EXCL = the atomic commit point; a concurrent writer that
            # raced us to this version loses here, before visibility
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise SnapshotConflict(
                f"version {version} already committed at {self.path}"
            ) from exc
        with os.fdopen(fd, "w") as f:
            f.write(manifest)
        return version

    def write(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Commit a new version; returns its number.

        ``overwrite`` → the new version references only the new files;
        ``append`` → it references the previous version's directories
        PLUS the new files (no data is ever copied or rewritten).
        """
        prev = self.latest_version()
        version = 0 if prev is None else prev + 1
        dirs = self._write_files(df)
        base = self._manifest(prev)["dirs"] if (mode == "append" and prev is not None) else []
        return self._commit(version, base + [dirs], mode)

    def delete_where(self, predicate: Column) -> int:
        """Predicate delete as a retained-rows rewrite (ref
        routers/generation.py:78-80's bulk delete) — a new version, so
        readers of older versions are unaffected (MVCC).

        SQL DELETE semantics: only rows where the predicate is TRUE are
        deleted — predicate-NULL rows are RETAINED (``~pred`` alone would
        silently drop them)."""
        from pyspark.sql import functions as F

        retained = self.read().filter(~predicate.eqNullSafe(F.lit(True)))
        return self.write(retained, mode="overwrite")

    def upsert(self, updates: DataFrame, key: str) -> int:
        """MERGE-style upsert committed as a new version (reuses the
        CDC merge operator — operators/merge.py)."""
        from lexam_data_pipeline_spark.operators.merge import merge_upsert

        return self.write(merge_upsert(self.read(), updates, [key]), mode="overwrite")

    # -- read path ----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: latest committed)."""
        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        dirs = self._manifest(version)["dirs"]
        paths = [os.path.join(self.path, d) for d in dirs]
        return self.spark.read.parquet(*paths)

    def changes(self, v_from: int, v_to: int) -> DataFrame:
        """CDC row diff between two versions: full rows tagged
        ``_change = 'insert' | 'delete'`` (an update appears as both).
        Two hash anti-joins over the version pair — the generic diff; a
        keyed table can diff cheaper via merge_upsert's change columns.
        """
        from pyspark.sql import functions as F

        old, new = self.read(v_from), self.read(v_to)
        inserts = new.exceptAll(old).withColumn("_change", F.lit("insert"))
        deletes = old.exceptAll(new).withColumn("_change", F.lit("delete"))
        return inserts.unionByName(deletes)

    # -- maintenance --------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions and
        unlink data directories nothing references; returns removed dirs."""
        vs = self.versions()
        # NOT vs[-keep_last:]: Python's -0 slice would keep EVERY version's
        # dirs referenced while the loop below deletes every manifest
        keep_vs = vs[-keep_last:] if keep_last > 0 else []
        referenced: set[str] = set()
        for v in keep_vs:
            referenced.update(self._manifest(v)["dirs"])
        for v in vs[:-keep_last] if keep_last else vs:
            os.remove(self._manifest_path(v))
        removed = []
        data_root = os.path.join(self.path, "data")
        for name in os.listdir(data_root) if os.path.isdir(data_root) else []:
            rel = f"data/{name}"
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
        return removed
