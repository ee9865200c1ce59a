"""HuggingFace dataset source (SURVEY §2.1 S1; ref backend/app/seed.py:75-83
``load_dataset("LEXam-Benchmark/LEXam", config)["test"]``).

The reference seeds from the HF hub at startup.  Here the adapter is a
thin, dependency-gated bridge into Spark:

* with the public ``datasets`` package installed, ``load_hf_dataset``
  resolves hub names / local dirs through it and hands the underlying
  Arrow table to ``spark.createDataFrame`` (PySpark 4 ingests
  ``pyarrow.Table`` directly — one Arrow hop, no pandas round trip);
* without it (this container), the loader reads the two on-disk layouts
  HF tooling produces — ``Dataset.save_to_disk`` Arrow-IPC dirs and
  parquet exports — via pyarrow alone, so seeding from a local dump
  needs no extra dependency.

Seeding is a driver-side ``createDataFrame`` by design: seed inputs are
question banks (thousands of rows — the reference inserts them row by
row).  For corpus-scale HF parquet exports use ``hf_parquet_scan``,
which is a plain distributed ``spark.read.parquet`` with all the usual
pushdown/pruning.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _arrow_table_from_save_to_disk(path: str):
    """Read a ``Dataset.save_to_disk`` directory with pyarrow only.

    Layout: ``state.json`` lists ``_data_files`` (Arrow IPC files —
    stream-framed despite the ``.arrow`` suffix; older dumps used the
    file format, so both are tried)."""
    import pyarrow as pa
    import pyarrow.ipc

    state_path = os.path.join(path, "state.json")
    with open(state_path) as fh:
        state = json.load(fh)
    tables = []
    for entry in state["_data_files"]:
        fname = os.path.join(path, entry["filename"])
        try:
            with pa.ipc.open_stream(fname) as reader:
                tables.append(reader.read_all())
        except pa.ArrowInvalid:
            with pa.ipc.open_file(fname) as reader:
                tables.append(reader.read_all())
    return pa.concat_tables(tables)


def _arrow_table_from_parquet_dir(path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path)


def load_hf_dataset(
    spark: SparkSession,
    name_or_path: str,
    *,
    config: str | None = None,
    split: str | None = None,
) -> DataFrame:
    """HF dataset → Spark DataFrame.

    ``name_or_path`` may be a hub id (requires the ``datasets`` package)
    or a local directory (``save_to_disk`` layout or parquet export —
    pyarrow-only fallback).  ``split`` selects a subdirectory for
    ``DatasetDict`` layouts (e.g. the reference's ``["test"]``).
    """
    try:
        import datasets  # public package; absent in this container

        if os.path.isdir(name_or_path):
            ds = datasets.load_from_disk(name_or_path)
        else:
            ds = datasets.load_dataset(name_or_path, config)
        if split is not None:
            ds = ds[split]
        return spark.createDataFrame(ds.data.table)
    except ImportError:
        pass

    path = name_or_path
    if not os.path.isdir(path):
        raise ValueError(
            f"{name_or_path!r} is not a local directory and the 'datasets' "
            "package is not installed — hub ids need it (pip install datasets)"
        )
    if split is not None and os.path.isdir(os.path.join(path, split)):
        path = os.path.join(path, split)
    if os.path.exists(os.path.join(path, "state.json")):
        table = _arrow_table_from_save_to_disk(path)
    else:
        table = _arrow_table_from_parquet_dir(path)
    return spark.createDataFrame(table)


def hf_parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan of an HF parquet export — the corpus-scale path
    (plain ``spark.read.parquet``: pushdown, pruning, split planning)."""
    return spark.read.parquet(path)


def seed_configs_from_hf(
    spark: SparkSession,
    root: str,
    configs: list[str],
    *,
    split: str | None = None,
) -> dict[str, DataFrame]:
    """One DataFrame per config from ``root/<config>`` local dumps — the
    input shape :func:`lexam_data_pipeline_spark.ingest.union_configs`
    consumes (ref seed.py:68-83 loops configs the same way)."""
    return {
        cfg: load_hf_dataset(spark, os.path.join(root, cfg), split=split)
        for cfg in configs
    }
