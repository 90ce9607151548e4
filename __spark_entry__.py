"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``firefly_vcut_spark.plans`` — the named-query registry
where every SURVEY.md §2 operator lives as a (Spark callable, DuckDB
oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from firefly_vcut_spark.plans import all_queries

    qs = all_queries()
    name = "w1_flagship_occurrence_scan" if "w1_flagship_occurrence_scan" in qs else "q3_order_revenue"
    return qs[name].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from firefly_vcut_spark.plans import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for ops that
    aren't SQL-expressible → driver records a rows-only check)."""
    from firefly_vcut_spark.plans import all_queries

    return {name: q.sql for name, q in all_queries().items() if q.sql is not None}
