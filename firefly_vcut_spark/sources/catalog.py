"""Table catalog over the driver's synthetic Parquet.

Mirrors the reference's explicit-schema scans (every SELECT names its
columns — SURVEY.md §2.1 S1): reads pass an explicit StructType so that
the scan's ReadSchema is exactly what downstream needs and Catalyst can
prune/push down against known types.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from firefly_vcut_spark.schemas import TABLE_SCHEMAS

TABLES = tuple(TABLE_SCHEMAS)

# events.ts is written as parquet TIMESTAMP(NANOS) (TESTDATA.md), which
# Spark cannot read as TimestampType ([PARQUET_TYPE_ILLEGAL]); read the
# raw int64 nanos and convert to µs TimestampType (the oracle casts the
# same way: CAST(ts AS TIMESTAMP)).
_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with its pinned schema.

    Explicit schema (no inference) keeps the parquet footer read cheap
    and makes ReadSchema stable for pushdown; see SURVEY.md §1.4.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(_EVENTS_RAW).parquet(table_path(sf_dir, name))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
