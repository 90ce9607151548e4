"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registry query under Spark and its oracle SQL under DuckDB on
the same parquet, then compares row count, column names, and an
order-insensitive canonicalized value multiset. Used by the pytest
oracle suite; lets every operator be verified locally before the
driver's sf0.01 gate runs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from firefly_vcut_spark.sources.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _canon_value(v: object) -> object:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: tolerant of last-ulp engine drift,
        # strict enough to catch real bugs.
        return float(f"{v:.12g}")
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


@dataclass
class OracleResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


def compare(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    fn,
    sql: str,
) -> OracleResult:
    spark_pdf = fn(spark, sf_dir).toPandas()
    with duckdb_connection(sf_dir) as con:
        oracle_pdf = con.execute(sql).df()

    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return OracleResult(
            name, False, f"columns differ: spark={s_cols} oracle={o_cols}",
            len(spark_pdf), len(oracle_pdf),
        )
    if len(spark_pdf) != len(oracle_pdf):
        return OracleResult(
            name, False, f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}",
            len(spark_pdf), len(oracle_pdf),
        )
    s_rows, o_rows = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if s_rows != o_rows:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        )
        return OracleResult(
            name, False, f"values differ at sorted row {diff[0]}:\n  spark={diff[1]}\n  oracle={diff[2]}",
            len(spark_pdf), len(oracle_pdf),
        )
    return OracleResult(name, True, "ok", len(spark_pdf), len(oracle_pdf))
