"""Table catalog over the driver's synthetic Parquet.

Mirrors the reference's explicit-schema scans (every SELECT names its
columns — SURVEY.md §2.1 S1): reads pass an explicit StructType so that
the scan's ReadSchema is exactly what downstream needs and Catalyst can
prune/push down against known types.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from firefly_vcut_spark.schemas import TABLE_SCHEMAS

TABLES = tuple(TABLE_SCHEMAS)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with its pinned schema.

    Explicit schema (no inference) keeps the parquet footer read cheap
    and makes ReadSchema stable for pushdown; see SURVEY.md §1.4.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
