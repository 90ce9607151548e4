"""Distribution-drift monitoring — the data-quality axis a production
pipeline runs continuously: "did the incoming data's shape change?".

Two detectors, both integer-exact so the DuckDB oracle is bit-for-bit:

* ``agg_distribution_drift`` — per-feature categorical-distribution
  drift between a reference and a current event window (here AM vs PM
  traffic — the intraday train/serve-skew audit). The statistic is
  total-variation distance in parts-per-million computed from floored
  integer shares, i.e. no ``ln`` (PSI) float edge anywhere.
* ``win_cusum_drift`` — CUSUM change-point scan over the daily value
  series: the cumulative deviation of each day's (quantized) revenue
  from the global daily mean, kept as an EXACT decimal numerator so
  the argmax day is engine-stable.

Reference scope note: the reference (firefly-vcut) has no drift
monitoring; this belongs to the training-data/pipeline-health surface
the brief adds (same family as agg_dq_expectations / agg_skew_audit).

Scale shape: each detector is ONE events scan into a partial
(map-side-combined) aggregate whose output is bounded by the feature
alphabet (23 buckets) or the day count — never by row count. The
follow-on share/window math runs on that bounded relation. At 100 TB
the only exchange that grows is the partial-agg combine, which is the
minimum any distribution audit can do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_PPM = 1_000_000

# feature alphabet: name -> (bucket SQL, bucket Column builder)
# value_band buckets on exact cents (round(value*100) is exact for the
# 2-decimal fixture values) so the band boundary never touches float
# division; user cohorts are a stable hash-mod audit dimension.
_FEATURES_SQL = {
    "event_type": "event_type",
    "value_band": "CAST(CAST(round(value * 100) AS BIGINT) // 5000 AS VARCHAR)",
    "user_cohort": "CAST(user_id % 8 AS VARCHAR)",
}


def _features_col():
    return F.array(
        F.struct(
            F.lit("event_type").alias("feature"),
            F.col("event_type").alias("bucket"),
        ),
        F.struct(
            F.lit("value_band").alias("feature"),
            F.expr("CAST(CAST(round(value * 100) AS BIGINT) DIV 5000 AS STRING)").alias(
                "bucket"
            ),
        ),
        F.struct(
            F.lit("user_cohort").alias("feature"),
            F.expr("CAST(user_id % 8 AS STRING)").alias("bucket"),
        ),
    )


def bucket_counts(events: DataFrame, ref_pred, feature_col=None) -> DataFrame:
    """Stage 1 of the drift audit: per (feature, bucket) counts in the
    reference window (``ref_pred``) and its complement. This is the
    SUMMABLE part — per-batch outputs from disjoint slices add up to
    the full-data counts, which is what the streaming drift sink
    appends as segments (streaming/incremental.write_drift_monitor_sink)."""
    feats = feature_col if feature_col is not None else _features_col()
    return (
        events.select(
            F.explode(feats).alias("fb"),
            F.when(ref_pred, F.lit(1)).otherwise(F.lit(0)).alias("is_ref"),
        )
        .groupBy(F.col("fb.feature").alias("feature"), F.col("fb.bucket").alias("bucket"))
        .agg(
            F.sum("is_ref").cast("long").alias("ref_cnt"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cur_cnt"),
        )
    )


def drift_from_counts(per_bucket: DataFrame) -> DataFrame:
    """Stage 2: shares + total-variation from consolidated counts.
    Runs on the bounded (feature, bucket) relation, never on events.

    An EMPTY window is a real state for an always-on monitor (an
    ingest that so far has only reference-hours events), so the ppm
    shares guard the zero denominator explicitly — ANSI mode (this
    repo's default) would otherwise throw DIVIDE_BY_ZERO at read
    time. An absent window reports share 0 for every bucket, hence
    TV = Σ|live ppm|/2 — "everything drifted", the alert a monitor
    should raise. All division is integer DIV, bit-for-bit with the
    oracle by construction (not merely because sums stay under 2^53)."""
    w = Window.partitionBy("feature")
    shared = (
        per_bucket.withColumn("ref_tot", F.sum("ref_cnt").over(w))
        .withColumn("cur_tot", F.sum("cur_cnt").over(w))
        .withColumn(
            "ref_ppm",
            F.expr(
                f"CASE WHEN ref_tot > 0 THEN (ref_cnt * {_PPM}) DIV ref_tot "
                "ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .withColumn(
            "cur_ppm",
            F.expr(
                f"CASE WHEN cur_tot > 0 THEN (cur_cnt * {_PPM}) DIV cur_tot "
                "ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .withColumn("delta_ppm", F.abs(F.col("ref_ppm") - F.col("cur_ppm")))
        .withColumn("tv_sum", F.sum("delta_ppm").over(w))
    )
    return shared.select(
        "feature",
        "bucket",
        "ref_cnt",
        "cur_cnt",
        F.col("ref_ppm").cast("long").alias("ref_ppm"),
        F.col("cur_ppm").cast("long").alias("cur_ppm"),
        F.col("delta_ppm").cast("long").alias("delta_ppm"),
        F.expr("tv_sum DIV 2").cast("long").alias("feature_tv_ppm"),
    )


def distribution_drift(events: DataFrame, ref_pred, feature_col=None) -> DataFrame:
    """Total-variation drift between the ``ref_pred`` window and its
    complement, per feature/bucket. All shares are floored integer
    parts-per-million (BIGINT-safe to ~9e12 rows per window; a true
    100 TB run casts the ppm numerator to decimal(38,0) — same plan).
    """
    return drift_from_counts(bucket_counts(events, ref_pred, feature_col))


_DRIFT_SQL_FEATURES = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS feature, {expr} AS bucket,
               CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END AS is_ref
        FROM events"""
    for name, expr in _FEATURES_SQL.items()
)


@query(
    "agg_distribution_drift",
    sql=f"""
    WITH fb AS ({_DRIFT_SQL_FEATURES}),
    per_bucket AS (
        SELECT feature, bucket,
               CAST(sum(is_ref) AS BIGINT) AS ref_cnt,
               CAST(sum(1 - is_ref) AS BIGINT) AS cur_cnt
        FROM fb GROUP BY feature, bucket
    ),
    shared AS (
        SELECT *,
               sum(ref_cnt) OVER (PARTITION BY feature) AS ref_tot,
               sum(cur_cnt) OVER (PARTITION BY feature) AS cur_tot
        FROM per_bucket
    ),
    ppm AS (
        SELECT feature, bucket, ref_cnt, cur_cnt,
               CASE WHEN ref_tot > 0 THEN (ref_cnt * {_PPM}) // ref_tot
                    ELSE 0 END AS ref_ppm,
               CASE WHEN cur_tot > 0 THEN (cur_cnt * {_PPM}) // cur_tot
                    ELSE 0 END AS cur_ppm,
               abs(CASE WHEN ref_tot > 0 THEN (ref_cnt * {_PPM}) // ref_tot
                        ELSE 0 END
                   - CASE WHEN cur_tot > 0 THEN (cur_cnt * {_PPM}) // cur_tot
                          ELSE 0 END) AS delta_ppm
        FROM shared
    )
    SELECT feature, bucket, ref_cnt, cur_cnt,
           CAST(ref_ppm AS BIGINT) AS ref_ppm,
           CAST(cur_ppm AS BIGINT) AS cur_ppm,
           CAST(delta_ppm AS BIGINT) AS delta_ppm,
           CAST(sum(delta_ppm) OVER (PARTITION BY feature) // 2 AS BIGINT)
               AS feature_tv_ppm
    FROM ppm
    """,
    tags=("agg", "analytics", "drift", "extension"),
)
def agg_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday distribution drift (AM reference vs PM current) over
    three monitored features — event-type mix, value band (50-unit
    cents bands), user cohort (id mod 8). One row per (feature,
    bucket) with both counts, floored integer ppm shares, the
    per-bucket |Δppm|, and the feature-level total-variation distance
    in ppm (Σ|Δ|/2) — the number a drift monitor alerts on."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value", "user_id")
    return distribution_drift(ev, F.hour("ts") < 12)


def cusum_daily(events: DataFrame) -> DataFrame:
    """Per-day CUSUM numerator over quantized daily revenue.

    day_cents d_i are exact integers; the global daily mean is the
    rational T/N (T = Σd_i, N = #days). The CUSUM deviation after day
    k is Σ_{i<=k}(d_i − T/N); multiplying through by N gives the EXACT
    integer numerator N·Σd_i − k·T — monotone-equivalent for the
    argmax, no float anywhere. decimal(38,0) keeps 100 TB-scale sums
    exact (cents ~1e16 × days ~1e4 is past BIGINT)."""
    daily = (
        events.select(
            F.to_date("ts").alias("day"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("decimal(38,0)").alias("day_cents"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy().orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("n_days", F.count(F.lit(1)).over(w_all))
        .withColumn("total_cents", F.sum("day_cents").over(w_all))
        .withColumn("cum_cents", F.sum("day_cents").over(w_cum))
        .withColumn("k", F.row_number().over(Window.partitionBy().orderBy("day")))
        .select(
            F.col("day").cast("string").alias("day"),
            # decimal(38,0) math, VARCHAR on the wire: the driver's hash
            # surface is {BIGINT, DOUBLE, VARCHAR} (same contract as
            # kmeans_sql's centroid output) — shipping raw DECIMAL(38,0)
            # would hash-mismatch even when every digit is identical.
            F.col("day_cents").cast("decimal(38,0)").cast("string").alias(
                "day_cents"
            ),
            (
                F.col("cum_cents") * F.col("n_days")
                - F.col("k") * F.col("total_cents")
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("cusum_num"),
        )
    )


@query(
    "win_cusum_drift",
    sql="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DECIMAL(38,0))
                   AS day_cents
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day, day_cents,
               sum(day_cents) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS cum_cents,
               row_number() OVER (ORDER BY day) AS k,
               count(*) OVER () AS n_days,
               sum(day_cents) OVER () AS total_cents
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(day_cents AS VARCHAR) AS day_cents,
           CAST(CAST(cum_cents * n_days - k * total_cents AS DECIMAL(38,0))
                AS VARCHAR) AS cusum_num
    FROM cum
    """,
    tags=("window", "analytics", "drift", "extension"),
)
def win_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan on daily revenue: the exact integer
    CUSUM numerator per day (N·cumsum − k·total). The |max| row is the
    most likely level-shift day; a flat series hovers near 0. The
    one-partition ordered window runs on the DAY-count relation
    (bounded: one row per day after the partial agg), not on events."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    return cusum_daily(ev)
