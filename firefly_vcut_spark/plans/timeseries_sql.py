"""Time-series operators over the events table: grid resample with
forward-fill, integer-exact rolling z-score anomaly detection, and an
ordered-fold EWMA — the hypertable post-processing family (gap-fill /
`locf` / anomaly scan) downstream of the windowed rollups in
windows_sql.py.

Determinism discipline: every statistic that crosses the oracle hash
is computed from EXACT integer sums (values quantized to 1e-4), with
the float expression tree written identically in both engines — so
rolling mean/variance and the EWMA fold are bit-stable under any
partitioning, unlike naive float window sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_Q = 10_000  # value quantization: 1e-4 ticks, exact in BIGINT


@query(
    "win_gapfill_daily",
    sql="""
    WITH daily AS (
      SELECT user_id,
             CAST(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             count(*) AS n,
             round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0, 4) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(d) AS dmin, max(d) AS dmax FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    joined AS (
      SELECT g.user_id, g.d, coalesce(dd.n, 0) AS n, dd.v
      FROM grid g LEFT JOIN daily dd ON dd.user_id = g.user_id AND dd.d = g.d
    )
    SELECT user_id,
           strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_events,
           round(last_value(v IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 4) AS filled_value
    FROM joined
    """,
    tags=("window", "temporal", "timeseries", "extension"),
)
def win_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid resample + LOCF gap-fill: each user's daily value series
    densified to every day between their first and last event
    (per-user F.sequence grid — no driver loop, no global calendar),
    missing days carried forward with last-observation (`F.last`
    ignorenulls over the cumulative frame). The TimescaleDB
    `time_bucket_gapfill` + `locf` shape.

    Scale: the grid explode is map-side off a per-user 2-row bound
    aggregate; the only shuffles are the daily rollup and the
    per-user fill window — both keyed on user_id, so AQE can reuse
    the exchange."""
    ev = load_table(spark, sf_dir, "events")
    # daily value rollup in the quantized-BIGINT domain (module
    # determinism discipline): a raw double SUM is order-dependent,
    # so its 4th rounded decimal could flip between partitionings —
    # sum exact 1e-4 ticks instead and divide back once.
    daily = (
        ev.groupBy(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * _Q).cast("long"))
                / F.lit(float(_Q)),
                4,
            ).alias("v"),
        )
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
        .select(
            "user_id",
            F.explode(
                F.sequence("dmin", "dmax", F.expr("INTERVAL 1 DAY"))
            ).alias("d"),
        )
    )
    joined = grid.join(daily, ["user_id", "d"], "left").select(
        "user_id", "d", F.coalesce("n", F.lit(0)).alias("n"), "v"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias(
            "filled_value"
        ),
    )


# z-score from exact integer frame sums: q = round(value·1e4),
# mean = Σq/n, var_samp = (n·Σq² − (Σq)²) / (n·(n−1)), all in the
# quantized domain; z = (q·n − Σq) / (n · sqrt(var)) — written as the
# SAME expression tree in both engines so the doubles agree bitwise.
_ZSCORE_SQL = """
    WITH q AS (
      SELECT user_id, event_id, ts, value,
             CAST(round(value * 10000) AS BIGINT) AS qv
      FROM events
    ),
    framed AS (
      SELECT user_id, event_id, ts, value, qv,
             count(*)  OVER w AS n,
             sum(qv)   OVER w AS sq,
             sum(qv * qv) OVER w AS sq2
      FROM q
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
           round(value, 4) AS value,
           round((CAST(qv AS DOUBLE) * n - sq)
                 / (n * sqrt((CAST(n AS DOUBLE) * sq2 - CAST(sq AS DOUBLE) * sq)
                             / (CAST(n AS DOUBLE) * (n - 1)))), 4) AS zscore
    FROM framed
    WHERE n >= 10
      AND (CAST(n AS DOUBLE) * sq2 - CAST(sq AS DOUBLE) * sq) > 0
      AND abs((CAST(qv AS DOUBLE) * n - sq)
              / (n * sqrt((CAST(n AS DOUBLE) * sq2 - CAST(sq AS DOUBLE) * sq)
                          / (CAST(n AS DOUBLE) * (n - 1))))) > 2.0
"""


@query(
    "win_zscore_anomalies",
    sql=_ZSCORE_SQL,
    tags=("window", "timeseries", "anomaly", "extension"),
)
def win_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly scan: each event scored against the
    mean/std of its user's previous ≤20 events (strictly preceding
    frame — no self-leakage), flagged when |z| > 2 with ≥10-point
    history. Variance comes from exact integer sums of the quantized
    values, so the score is reproducible under any partitioning — the
    float-window-sum trap this family usually hits.

    Scale: one shuffle on user_id; frame state is O(21) per row."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.withColumn("qv", F.round(F.col("value") * _Q).cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    framed = q.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "qv",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("qv").over(w).alias("sq"),
        F.sum(F.col("qv") * F.col("qv")).over(w).alias("sq2"),
    )
    n_d = F.col("n").cast("double")
    disc = n_d * F.col("sq2") - F.col("sq").cast("double") * F.col("sq")
    z = (F.col("qv").cast("double") * F.col("n") - F.col("sq")) / (
        F.col("n") * F.sqrt(disc / (n_d * (F.col("n") - 1)))
    )
    return framed.filter(
        (F.col("n") >= 10) & (disc > 0) & (F.abs(z) > 2.0)
    ).select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.round("value", 4).alias("value"),
        F.round(z, 4).alias("zscore"),
    )


@query(
    "win_ewma_user_value",
    sql=f"""
    WITH q AS (
      SELECT user_id,
             CAST(round(value * {_Q}) AS BIGINT) AS qv,
             ts, event_id
      FROM events
    ),
    folded AS (
      SELECT user_id, count(*) AS n,
             list_reduce(list(qv ORDER BY ts, event_id),
                         (acc, x) -> (3 * acc + x) // 4) AS ewma_q
      FROM q GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           round(CAST(ewma_q AS DOUBLE) / {_Q}, 4) AS ewma_value
    FROM folded
    """,
    tags=("agg", "timeseries", "extension"),
)
def win_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α = 1/4) of the event value as an ORDERED FOLD:
    collect the user's quantized values in (ts, event_id) order and
    fold s ← ⌊(3s + q)/4⌋ in exact integer arithmetic — the
    inherently-sequential recurrence window functions cannot express,
    kept deterministic (and oracle-replayable via DuckDB's ordered
    list + list_reduce) by integer flooring each step.

    Scale: one shuffle on user_id; the fold is array codegen over one
    user's values — state O(1), array O(user's events). For unbounded
    per-user streams this becomes applyInPandasWithState (same
    recurrence, state = one integer)."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "user_id",
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("eid"),
            F.round(F.col("value") * _Q).cast("long").alias("qv"),
        ).alias("rec"),
    )
    folded = q.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.transform(
            F.array_sort(F.collect_list("rec")), lambda r: r["qv"]
        ).alias("qs"),
    )
    ewma = F.aggregate(
        F.slice(F.col("qs"), 2, F.size("qs") - 1),
        F.element_at(F.col("qs"), 1),
        lambda acc, x: F.floor((3 * acc + x) / 4).cast("long"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.round(ewma.cast("double") / _Q, 4).alias("ewma_value"),
    )


@query(
    "win_cumulative_distinct_users",
    sql="""
    WITH base AS (
      SELECT event_type,
             strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d') AS day,
             user_id
      FROM events
    ),
    firsts AS (
      SELECT event_type, user_id, min(day) AS first_day
      FROM base GROUP BY 1, 2
    ),
    news AS (
      SELECT event_type, first_day AS day, count(*) AS new_users
      FROM firsts GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT event_type, day FROM base)
    SELECT d.event_type, d.day,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0))
                OVER (PARTITION BY d.event_type ORDER BY d.day)
                AS BIGINT) AS cum_distinct_users
    FROM days d LEFT JOIN news n
      ON n.event_type = d.event_type AND n.day = d.day
    """,
    tags=("window", "distinct", "timeseries", "extension"),
)
def win_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT users per event_type by day — the windowed
    COUNT(DISTINCT) Spark (and most engines) cannot express directly,
    rewritten as first-occurrence counting: min(first-seen day) per
    (type, user), daily new-user counts, and a running sum over the
    active days. The standard workaround, registered so its
    equivalence is hash-proven.

    Scale: two hash aggregates (user-level firsts, daily rollup) +
    one tiny window over O(types×days) rows — the user-level shuffle
    happens ONCE, instead of once per window frame as a naive
    windowed-distinct would."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    firsts = base.groupBy("event_type", "user_id").agg(
        F.min("day").alias("first_day")
    )
    news = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    days = base.select("event_type", "day").distinct()
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        days.join(news, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
        .withColumn(
            "cum_distinct_users",
            F.sum("new_users").over(w).cast("long"),
        )
    )


@query(
    "win_rolling_active_users",
    sql="""
    WITH du AS (
      SELECT DISTINCT CAST(time_bucket(INTERVAL '1 day',
                           CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             user_id
      FROM events
    ),
    cover AS (
      SELECT CAST(du.d + CAST(o.off AS INTEGER) AS DATE) AS d, du.user_id
      FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
    ),
    wau AS (SELECT d, count(DISTINCT user_id) AS wau FROM cover GROUP BY d),
    dau AS (SELECT d, count(*) AS dau FROM du GROUP BY d)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
    tags=("window", "distinct", "timeseries", "analytics", "extension"),
)
def win_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the sliding
    COUNT(DISTINCT) that neither window frames nor first-occurrence
    counting can express. Rewritten as coverage expansion: each
    (user, active-day) pair covers the next 7 report days, so WAU(d)
    = distinct users covering d — one ×7 map-side explode instead of
    re-scanning a 7-day window per report day. Days with activity
    report (only days present in `du` join through).

    Scale: the explode multiplies the (user, day) DISTINCT pairs (not
    raw events) by the window length; both counts are ordinary hash
    aggregates. Window length w costs ×w rows — for monthly windows
    swap in the sorted-merge HLL union of 30 daily sketches."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    cover = du.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda off: F.date_add(F.col("d"), off.cast("int")),
            )
        ).alias("d"),
        "user_id",
    )
    wau = cover.groupBy("d").agg(F.countDistinct("user_id").alias("wau"))
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "d").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
            "stickiness"
        ),
    )
