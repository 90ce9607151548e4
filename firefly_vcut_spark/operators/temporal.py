"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range (interval) join — the time-series lookups a 100 TB
event/archive warehouse needs (SURVEY §2.3's 'the 100 TB design may
add range-join for time-interval lookups' row).

Scale design:
- ``asof_join`` uses the UNION-AND-SWEEP formulation, not an
  inequality join: tag both sides, sort per key by (ts, side), carry
  the latest right payload forward with ``last(ignorenulls)`` over an
  unbounded-preceding window, keep left rows. ONE shuffle on the key,
  O(n log n) per key, no pair explosion — an inequality join would
  build |left|×|right| candidates per key before filtering.
- ``range_join_bucketed`` turns the interval predicate into an
  equi-join on overlapping fixed-width time buckets (each interval
  lands in the buckets it spans, each probe row in one bucket), then
  applies the exact bounds — candidate pairs scale with bucket
  occupancy, not |left|×|right| per key. Interval length must be
  bounded by ``max_interval`` (buckets per interval = O(max_interval /
  bucket_width)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every left row, attach the payload of the latest right row
    with ``right_ts <= left_ts`` within the same key (NULL payload when
    no right row precedes). Ties on equal ts take the right row
    (side ordering: right sorts before left at the same timestamp)."""
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "_side",
        "_l",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c_{c}").alias(c) for c in payload_cols],
    )


def range_join_bucketed(
    probes: DataFrame,
    intervals: DataFrame,
    key: str,
    probe_ts: str,
    interval_start: str,
    interval_end: str,
    bucket_width: int,
    max_interval: int,
) -> DataFrame:
    """Inner join of point rows to interval rows on
    ``key AND start <= ts <= end`` via time-bucket blocking.

    Choose ``max_interval`` ≥ the true maximum interval length:
    coverage beyond ``start + max_interval`` is truncated (the bound
    is what keeps the per-interval bucket fan-out O(max_interval /
    bucket_width) instead of unbounded)."""
    n_buckets = max_interval // bucket_width + 2

    def bucket_of(col: str):
        # Integer bucket math: double division + cast can round a
        # large integer timestamp (near 2^53) into the wrong bucket
        # and silently drop matches; `div` stays in long arithmetic.
        return F.expr(f"CAST(`{col}` AS BIGINT) div {bucket_width}")

    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                bucket_of(interval_start),
                F.least(
                    bucket_of(interval_end),
                    bucket_of(interval_start) + n_buckets,
                ),
            )
        ),
    )
    pr = probes.withColumn("_bucket", bucket_of(probe_ts))
    joined = pr.join(iv, [key, "_bucket"], "inner").filter(
        (F.col(probe_ts) >= F.col(interval_start))
        & (F.col(probe_ts) <= F.col(interval_end))
    )
    return joined.drop("_bucket")
