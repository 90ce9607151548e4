"""Event-time window queries over the events table — the batch twins
of the streaming aggregations (tumbling, hopping, session windows),
each with a DuckDB oracle (time_bucket / gaps-and-islands)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table
from firefly_vcut_spark.streaming.incremental import windowed_event_counts


@query(
    "w_tumbling_counts",
    sql="""
    SELECT strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0, 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming", "agg"),
)
def w_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (1 day) per event_type — the same
    transformation the streaming path runs with a watermark
    (streaming/incremental.py::windowed_event_counts runs on both)."""
    return windowed_event_counts(load_table(spark, sf_dir, "events"))


@query(
    "w_hopping_counts",
    sql="""
    WITH hops AS (
        SELECT event_type, value,
               UNNEST([
                   time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)),
                   time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP))
                       - INTERVAL '12 hours'
               ]) AS window_start
        FROM events
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n
    FROM hops GROUP BY 1, 2
    """,
    tags=("window", "streaming", "agg"),
)
def w_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows (1 day long, 12 h slide): every event lands in
    two windows; Spark's window() emits both, the oracle reconstructs
    them as the two enclosing 12 h-aligned starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


@query(
    "w_hypertable_rollup",
    sql="""
    WITH rollup AS (
        SELECT strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d') AS day,
               event_type, count(*) AS n, round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0, 4) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) < DATE '2024-01-20'
        GROUP BY 1, 2
    ),
    tail AS (
        SELECT strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d') AS day,
               event_type, count(*) AS n, round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0, 4) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) >= DATE '2024-01-20'
        GROUP BY 1, 2
    )
    SELECT * FROM rollup UNION ALL SELECT * FROM tail
    """,
    tags=("window", "rollup", "agg"),
)
def w_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous aggregate: frozen daily rollup below the
    2024-01-20 watermark + raw tail re-aggregated at query time, one
    seamless series (operators/rollup.py — at scale the rollup is a
    stored table and only the bounded tail is scanned raw)."""
    from firefly_vcut_spark.operators.rollup import continuous_aggregate

    ev = load_table(spark, sf_dir, "events")
    return continuous_aggregate(ev, "2024-01-20")


@query(
    "w_session_windows",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '8 hours'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n,
           round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0, 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("window", "streaming", "agg", "session"),
)
def w_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (8 h gap) per user via the built-in
    session_window — state-merging windows on batch AND streaming
    (shared with streaming/incremental.session_event_rollup, whose
    streaming half is drained across restarts in
    tests/test_streaming_sketch.py); the oracle derives identical
    sessions with gaps-and-islands."""
    from firefly_vcut_spark.streaming.incremental import session_event_rollup

    return session_event_rollup(load_table(spark, sf_dir, "events"))


@query(
    "st_enrich_stream_static",
    sql="""
    SELECT e.event_id, e.user_id, e.event_type,
           round(e.value, 4) AS value,
           c.c_mktsegment AS segment,
           CAST(c.c_nationkey AS BIGINT) AS nationkey
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
    tags=("streaming", "join"),
)
def st_enrich_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/incremental.enriched_user_events: the
    stream-static broadcast enrichment join (per-micro-batch dim
    snapshot). Oracle checks the join itself; stream==batch asserted
    in tests/test_streaming.py."""
    from firefly_vcut_spark.streaming.incremental import enriched_user_events

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return enriched_user_events(ev, cust).select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
        "segment",
        "nationkey",
    )


@query(
    "st_click_purchase_pairs",
    sql="""
    SELECT p.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           round(p.value, 4) AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
    """,
    tags=("streaming", "join", "temporal"),
)
def st_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/incremental.click_purchase_pairs: the
    watermark-bounded stream-stream interval join (clicks within 30
    minutes before each purchase). The time-bound is what keeps join
    state O(window) when both sides stream."""
    from firefly_vcut_spark.streaming.incremental import click_purchase_pairs

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_pairs(ev)
