"""Self-check harness: run a declared query on Spark and DuckDB, compare.

Mirrors the driver's t2 gate (row count + schema + order-insensitive value
hash) so regressions are caught locally before a round ends.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from lexam_data_pipeline_spark.catalog import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by stringified values."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _canon_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


@dataclass
class CompareResult:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"{status} {self.key}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n      {m}"
        return msg


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    key: str,
    query_fn,
    sql: str,
    sf_dir: str,
) -> CompareResult:
    spark_pd = query_fn(spark, sf_dir).toPandas()
    oracle_pd = con.execute(sql).fetchdf()
    mism: list[str] = []
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        mism.append(f"columns: spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}")
    if len(spark_pd) != len(oracle_pd):
        mism.append("row count differs")
    if not mism:
        a, b = _canon(spark_pd), _canon(oracle_pd)
        neq = (a != b).any(axis=1)
        if neq.any():
            idx = neq[neq].index[:3]
            for i in idx:
                mism.append(f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
            mism.insert(0, f"{int(neq.sum())}/{len(a)} rows differ")
    return CompareResult(key, not mism, len(spark_pd), len(oracle_pd), mism)
