"""Temporal-join queries: as-of join (cross-validated against
DuckDB's native ASOF JOIN) and bucketed range join (cross-validated
against a plain inequality join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.temporal import asof_join, range_join_bucketed
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx
from firefly_vcut_spark.sources.catalog import load_table

# probe timestamps mapped deterministically into the archive era so
# both temporal joins produce real matches (events are 2024, archives
# derive from 1997-2001 order dates)
_PROBE_TS_SQL = "853286400 + (event_id * 7919) % 157680000"


def _probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").alias("profile_id"),
        (F.lit(853286400) + (F.col("event_id") * 7919) % 157680000).alias("probe_ts"),
    )


@query(
    "t_asof_join_latest_archive",
    sql=fx.with_fixtures(
        f"""
    , probes AS (
        SELECT event_id, user_id AS profile_id,
               {_PROBE_TS_SQL} AS probe_ts
        FROM events
    )
    SELECT p.event_id, p.profile_id, p.probe_ts,
           a.bvid AS asof_bvid, a.pubdate AS asof_pubdate
    FROM probes p
    ASOF LEFT JOIN archives a
      ON p.profile_id = a.vtuber_profile_id AND p.probe_ts >= a.pubdate
    """,
        "archives",
    ),
    tags=("join", "temporal", "asof"),
)
def t_asof_join_latest_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each probe event, the latest archive published
    at-or-before it for that profile (NULLs when none precedes).
    Union-and-sweep implementation — one shuffle on the key, no
    inequality-join pair explosion; the oracle is DuckDB's native
    ASOF LEFT JOIN."""
    probes = _probes(spark, sf_dir)
    archives = fx.archives(spark, sf_dir).select(
        F.col("vtuber_profile_id").alias("profile_id"),
        "pubdate",
        F.col("bvid").alias("asof_bvid"),
        F.col("pubdate").alias("asof_pubdate"),
    )
    return asof_join(
        probes,
        archives,
        key="profile_id",
        left_ts="probe_ts",
        right_ts="pubdate",
        payload_cols=["asof_bvid", "asof_pubdate"],
    )


@query(
    "t_range_join_events_in_live",
    sql=fx.with_fixtures(
        f"""
    , probes AS (
        SELECT event_id, user_id AS profile_id,
               {_PROBE_TS_SQL} AS probe_ts
        FROM events
    )
    SELECT p.event_id, a.id AS archive_id, p.probe_ts, a.pubdate, a.duration
    FROM probes p
    JOIN archives a
      ON a.vtuber_profile_id = p.profile_id
     AND p.probe_ts >= a.pubdate
     AND p.probe_ts <= a.pubdate + a.duration
    """,
        "archives",
    ),
    tags=("join", "temporal", "range"),
)
def t_range_join_events_in_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: probe events landing inside a live recording's
    [pubdate, pubdate+duration] window for the same profile. Bucketed
    blocking (1 h buckets, max interval 15000 s = the fixture's max
    duration) turns the interval predicate into an equi-join; the
    oracle states the same join as a plain inequality join."""
    probes = _probes(spark, sf_dir)
    intervals = fx.archives(spark, sf_dir).select(
        F.col("id").alias("archive_id"),
        F.col("vtuber_profile_id").alias("profile_id"),
        "pubdate",
        "duration",
        (F.col("pubdate") + F.col("duration")).alias("live_end"),
    )
    return range_join_bucketed(
        probes,
        intervals,
        key="profile_id",
        probe_ts="probe_ts",
        interval_start="pubdate",
        interval_end="live_end",
        bucket_width=3600,
        max_interval=15000,
    ).select("event_id", "archive_id", "probe_ts", "pubdate", "duration")
