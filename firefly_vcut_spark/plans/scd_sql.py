"""Slowly-changing-dimension (SCD Type 2) surface: derive a
versioned history table from a change stream, and answer point-in-
time (AS OF) lookups against it — the CDC/warehouse pattern that
turns an append-only event log into queryable dimension history.

Both queries are pure window/join shapes (no state machine): history
derivation is gaps-and-islands over (user, ts), the AS OF lookup is
the as-of join against validity intervals. Deterministic throughout —
(ts, event_id) total order, timestamps exported as strings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table


def scd2_history(events: DataFrame) -> DataFrame:
    """SCD2 derivation: treat each user's event_type as a tracked
    attribute; consecutive equal values collapse into one version row
    (valid_from = first ts of the run, valid_to = next version's
    start, NULL while current). Gaps-and-islands: a version starts
    where the value differs from its lag; island id = running count
    of starts; one (user, ts) shuffle shared by both windows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("attr"),
    ).withColumn(
        "is_start",
        F.when(
            F.col("attr") == F.lag("attr").over(w), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = marked.withColumn(
        "version",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    hist = islands.groupBy("user_id", "version").agg(
        F.min("attr").alias("attr"),  # constant within an island
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return hist.withColumn("valid_to", F.lead("valid_from").over(wv))


_SCD2_CTE = """
marked AS (
  SELECT user_id, ts, event_id, event_type AS attr,
         CASE WHEN event_type = lag(event_type)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
              THEN 0 ELSE 1 END AS is_start
  FROM events
),
islands AS (
  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM marked
),
hist AS (
  SELECT user_id, version,
         min(attr) AS attr,  -- constant within an island
         min(ts) AS valid_from,
         count(*) AS n_changes
  FROM islands GROUP BY user_id, version
),
hist2 AS (
  SELECT *, lead(valid_from)
              OVER (PARTITION BY user_id ORDER BY version) AS valid_to
  FROM hist
)
"""


@query(
    "win_scd2_history",
    sql=f"""
    WITH {_SCD2_CTE}
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           attr,
           strftime(CAST(valid_from AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
             AS valid_from,
           coalesce(strftime(CAST(valid_to AS TIMESTAMP),
                             '%Y-%m-%d %H:%M:%S'), 'CURRENT') AS valid_to,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM hist2
    """,
    tags=("window", "temporal", "scd", "extension"),
)
def win_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history built from the event log: one row per
    (user, attribute-run) with [valid_from, valid_to) validity and
    the run length — consecutive duplicate values collapsed, current
    version open-ended ('CURRENT'). The CDC pattern for dimension
    history without a mutable store.

    Scale: one (user, ts) sort shuffle shared by the lag, the island
    sum, and the rollup; history size is O(changes), not O(events)."""
    ev = load_table(spark, sf_dir, "events")
    h = scd2_history(ev)
    return h.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "attr",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
            "valid_from"
        ),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"),
            F.lit("CURRENT"),
        ).alias("valid_to"),
        F.col("n_changes").cast("long").alias("n_changes"),
    )


_ASOF_TS = "2024-06-15 00:00:00"


@query(
    "t_scd2_asof_lookup",
    sql=f"""
    WITH {_SCD2_CTE}
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           attr,
           strftime(CAST(valid_from AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
             AS valid_from
    FROM hist2
    WHERE valid_from <= TIMESTAMP '{_ASOF_TS}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_ASOF_TS}')
    """,
    tags=("temporal", "asof", "scd", "extension"),
)
def t_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) snapshot of the SCD2 dimension: each
    user's attribute value as it stood at the probe timestamp —
    validity-interval containment against the history table. With a
    probe COLUMN instead of a constant this is exactly the engine's
    as-of join (t_asof_join_latest_archive); the constant-probe form
    is the time-travel dimension read every warehouse needs.

    Scale: the filter prunes the history scan directly; no join at
    all for a constant probe."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.lit(_ASOF_TS).cast("timestamp")
    h = scd2_history(ev)
    return h.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    ).select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "attr",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
            "valid_from"
        ),
    )


def scd2_apply(history: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Incremental SCD2 maintenance: apply a CDC batch of later-dated
    change events to an existing history table, touching ONLY the
    affected users' OPEN versions — closed versions are immutable and
    pass through. Equivalent to re-deriving scd2_history from the full
    log (asserted slice-by-slice in tests/test_scd.py), but the
    nightly cost is O(batch + open rows), never O(history).

    Mechanics: each affected user's open version becomes a SEED row
    (its attr, valid_from, and accumulated n_changes) prepended to the
    user's new events; the same gaps-and-islands pass then renumbers
    versions from the seed's, merging the first island back into the
    open version when the attribute didn't change. Users with no
    history start at version 1.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ups = updates.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("attr"),
        F.lit(1).cast("long").alias("w"),
        F.lit(None).cast("long").alias("base_version"),
    )
    if history is not None:
        affected = history.join(
            updates.select("user_id").distinct(), "user_id"
        )
        untouched = history.join(
            updates.select("user_id").distinct(), "user_id", "left_anti"
        )
        closed = affected.filter(F.col("valid_to").isNotNull())
        seeds = affected.filter(F.col("valid_to").isNull()).select(
            "user_id",
            F.col("valid_from").alias("ts"),
            F.lit(-(1 << 62)).alias("event_id"),  # sorts before any event
            "attr",
            F.col("n_changes").alias("w"),
            F.col("version").alias("base_version"),
        )
        stream = seeds.unionByName(ups)
    else:
        untouched = closed = None
        stream = ups
    marked = stream.withColumn(
        "is_start",
        F.when(F.col("attr") == F.lag("attr").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "island",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    base = marked.groupBy("user_id").agg(
        F.coalesce(F.max("base_version"), F.lit(1)).alias("vbase")
    )
    hist = (
        marked.groupBy("user_id", "island")
        .agg(
            F.min("attr").alias("attr"),
            F.min("ts").alias("valid_from"),
            F.sum("w").cast("long").alias("n_changes"),
        )
        .join(base, "user_id")
        .select(
            "user_id",
            (F.col("island") + F.col("vbase") - 1).cast("long").alias("version"),
            "attr",
            "valid_from",
            "n_changes",
        )
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    tail = hist.withColumn("valid_to", F.lead("valid_from").over(wv))
    if closed is not None:
        return untouched.unionByName(closed).unionByName(
            tail.select(
                "user_id", "version", "attr", "valid_from", "n_changes", "valid_to"
            ).select(*untouched.columns)
        )
    return tail.select("user_id", "version", "attr", "valid_from", "n_changes", "valid_to")


@query(
    "t_scd2_enrich_events",
    sql=f"""
    WITH {_SCD2_CTE}
    SELECT e.event_id,
           e.user_id,
           h.attr AS version_attr,
           CAST(h.version AS BIGINT) AS version,
           CAST(CASE WHEN h.attr = e.event_type THEN 1 ELSE 0 END AS BIGINT)
             AS attr_matches
    FROM events e
    JOIN hist2 h
      ON h.user_id = e.user_id
     AND h.valid_from <= e.ts
     AND (h.valid_to IS NULL OR e.ts < h.valid_to)
    """,
    tags=("temporal", "range", "scd", "extension"),
)
def t_scd2_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-join enrichment: every event joined to the SCD2
    version valid AT ITS TIMESTAMP ([valid_from, valid_to)
    containment, column probe — the fact-to-dimension-history join a
    warehouse runs constantly). Self-verifying by construction: the
    valid version's attribute must equal the event's own type (the
    event either started that version or continued it), so
    ``attr_matches`` is 1 for every row — asserted in pytest AND
    visible to the oracle hash.

    Scale: both sides shuffle once on user_id; within a user the
    validity intervals are few (O(changes)), so the per-user interval
    probe is cheap — the bucketed-range-join shape with user as the
    block key."""
    ev = load_table(spark, sf_dir, "events")
    # the history derives from the same scan: rename its columns so
    # the self-join is unambiguous
    h = scd2_history(ev).select(
        F.col("user_id").alias("h_user"),
        F.col("version").alias("h_version"),
        F.col("attr").alias("h_attr"),
        F.col("valid_from").alias("h_from"),
        F.col("valid_to").alias("h_to"),
    )
    cond = (
        (F.col("h_user") == F.col("user_id"))
        & (F.col("h_from") <= F.col("ts"))
        & (F.col("h_to").isNull() | (F.col("ts") < F.col("h_to")))
    )
    return ev.join(h, cond).select(
        "event_id",
        "user_id",
        F.col("h_attr").alias("version_attr"),
        F.col("h_version").cast("long").alias("version"),
        F.when(F.col("h_attr") == F.col("event_type"), 1)
        .otherwise(0)
        .cast("long")
        .alias("attr_matches"),
    )
