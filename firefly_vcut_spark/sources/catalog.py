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

# Some vintages of the driver testdata write events.ts as parquet
# TIMESTAMP(NANOS), which Spark cannot read as TimestampType
# ([PARQUET_TYPE_ILLEGAL]); for those, read the raw int64 nanos and
# convert to µs TimestampType (the oracle casts the same way:
# CAST(ts AS TIMESTAMP)). Current testdata stores timestamp[us], which
# the pinned TABLE_SCHEMAS["events"] reads natively — so the conversion
# is gated on the parquet footer type (events_ts_is_nanos below).
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


def events_ts_is_nanos(path: str) -> bool:
    """True iff the events parquet at ``path`` stores ``ts`` as raw
    int64 / TIMESTAMP(NANOS) and needs the legacy nanos→µs conversion.

    One footer read (driver-side, O(KB)) decides the ingestion path, so
    either vintage of the driver testdata loads correctly.
    """
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = [n for n in os.listdir(path) if n.endswith(".parquet")]
        if not parts:
            return False
        path = os.path.join(path, sorted(parts)[0])
    field = pq.read_schema(path).field("ts")
    t = field.type
    return str(t) in ("int64", "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with its pinned schema.

    Explicit schema (no inference) keeps the parquet footer read cheap
    and makes ReadSchema stable for pushdown; see SURVEY.md §1.4.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events" and events_ts_is_nanos(table_path(sf_dir, name)):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(_EVENTS_RAW).parquet(table_path(sf_dir, name))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
