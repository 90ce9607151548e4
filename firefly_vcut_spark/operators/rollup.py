"""Hypertable-style continuous aggregate: a frozen pre-aggregated
rollup for history plus a raw tail re-aggregated at query time,
presented as one seamless series (the TimescaleDB continuous-aggregate
/ lambda-view pattern).

At 100 TB the rollup is a materialized table maintained incrementally
by the pipeline (append-only below the watermark → the rollup rows
never change and compact beautifully); only the tail — bounded by the
refresh cadence — is scanned raw. Query cost becomes
O(|rollup rows| + |tail events|) instead of O(|all events|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_rollup(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The materialization recipe: per (day, event_type) counts and
    value sums — mergeable partials, safe to maintain incrementally."""
    return (
        events.groupBy(
            F.date_format(F.window(ts_col, "1 day").start, "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact 1e-4 ticks: partial sums stay mergeable AND
            # partition-order independent (double sums could flip the
            # rounded 4th decimal between partitionings)
            F.round(
                F.sum(F.round(F.col("value") * 10000).cast("long"))
                / F.lit(10000.0),
                4,
            ).alias("total_value"),
        )
    )


def continuous_aggregate(
    events: DataFrame,
    watermark_day: str,
    ts_col: str = "ts",
    rollup: DataFrame | None = None,
) -> DataFrame:
    """Seamless daily series: frozen rollup for days < watermark_day,
    raw tail re-aggregated for days ≥ watermark_day.

    ``rollup`` defaults to materializing from ``events`` (what the
    pipeline would have persisted); pass a stored snapshot to skip the
    historical scan entirely.
    """
    wm: Column = F.lit(watermark_day)
    if rollup is None:
        rollup = daily_rollup(events.filter(F.to_date(ts_col) < F.to_date(wm)), ts_col)
    else:
        rollup = rollup.filter(F.to_date("day") < F.to_date(wm))
    tail = daily_rollup(events.filter(F.to_date(ts_col) >= F.to_date(wm)), ts_col)
    return rollup.unionByName(tail)
