"""Classic warehouse-analytics breadth: multi-way dimensional join,
conditional aggregation, and window-over-aggregate ranking — the
standard shapes a complete engine serves beyond the reference's own
query list (TPC-H Q5/Q14/Q15 analogs on the synthetic star schema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table


@query(
    "q5_revenue_by_nation",
    sql="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    tags=("join", "agg", "analytics"),
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style 6-way dimensional join: local-supplier revenue per
    nation within one region. All dims broadcast; the fact table
    shuffles once for the aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "q14_conditional_share",
    sql="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """,
    tags=("join", "agg", "analytics"),
)
def q14_conditional_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-style conditional aggregation: promo revenue share —
    CASE inside SUM, single broadcast join, scalar output."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), net).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(net), 4).alias("promo_share"))
    )


@query(
    "agg_pivot_status_by_priority",
    sql="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')   AS p2_high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW')    AS p5_low
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "pivot", "analytics"),
)
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts cross-tabbed status × priority. Spark's
    groupBy().pivot() with an explicit value list (no extra
    distinct-values job, stable output schema); the oracle states the
    same as FILTERed aggregates."""
    o = load_table(spark, sf_dir, "orders")
    labels = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    aliases = ["p1_urgent", "p2_high", "p3_medium", "p4_notspec", "p5_low"]
    pv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", labels)
        .agg(F.count(F.lit(1)))
    )
    out = pv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{l}`"), F.lit(0)).alias(a) for l, a in zip(labels, aliases)],
    )
    return out


@query(
    "agg_value_percentiles",
    sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.90), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile", "analytics"),
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type — Spark's
    percentile() and DuckDB's quantile_cont share the linear-
    interpolation definition. (At 100 TB swap in approx_percentile:
    mergeable sketches, no per-group sort.)"""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "q15_top_suppliers",
    sql="""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
        SELECT s.s_name, r.revenue,
               rank() OVER (ORDER BY r.revenue DESC, s.s_name ASC) AS rnk
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    )
    SELECT s_name, revenue, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
    tags=("join", "agg", "window", "analytics"),
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-style window-over-aggregate: top-10 suppliers by revenue.
    Aggregate first (fact collapses to |suppliers| rows), then rank
    the small result — never a window over the raw fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("s_name"))
    return (
        rev.join(F.broadcast(s), s.s_suppkey == rev.l_suppkey)
        .select("s_name", "revenue")
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )


@query(
    "agg_cube_status_priority",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube", "analytics"),
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping-set levels in
    one pass — Spark expands grouping sets BEFORE the partial agg, so
    it stays a single shuffle (no re-reads of the fact table)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


@query(
    "win_lead_lag_deltas",
    sql="""
    WITH w AS (
        SELECT user_id, event_id, ts,
               lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        FROM events WHERE user_id % 10 = 0
    )
    SELECT user_id, event_id,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_before_us,
           epoch_us(next_ts) - epoch_us(ts) AS gap_after_us
    FROM w
    """,
    tags=("window", "analytics"),
)
def win_lead_lag_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag session gaps per user: one shuffle on user_id, both
    window functions share the same frame so Spark evaluates them in
    a single Window node. Tiebreak on event_id keeps order (and the
    oracle hash) deterministic under equal timestamps. Gaps in exact
    integer microseconds (unix_micros / epoch_us) — seconds-level
    truncation vs rounding differs across engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    next_us = F.unix_micros(F.lead("ts").over(w))
    return ev.select(
        "user_id",
        "event_id",
        (us - prev_us).alias("gap_before_us"),
        (next_us - us).alias("gap_after_us"),
    )


@query(
    "win_running_totals",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS order_seq
    FROM orders WHERE o_custkey % 25 = 0
    """,
    tags=("window", "analytics"),
)
def win_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (cumulative frame) + order sequence
    number — one shuffle on o_custkey; ROWS frame (not RANGE) so ties
    accumulate row-at-a-time identically in both engines given the
    o_orderkey tiebreak."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(cum), 4).alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@query(
    "agg_price_quantity_stats",
    sql="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS covar_qty_price,
           round(stddev_samp(l_extendedprice), 4)             AS sd_price,
           round(avg(l_extendedprice), 4)                     AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "analytics"),
)
def agg_price_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar / stddev): single-pass
    mergeable moment sketches in both engines — at 100 TB these stay
    one map-side-combined shuffle, never a sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@query(
    "agg_nations_per_region_list",
    sql="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           count(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("agg", "listagg", "analytics"),
)
def agg_nations_per_region_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG: collect_list under a deterministic sort.
    array_sort(collect_list(...)) — not collect_list over sorted input,
    which Spark does NOT guarantee to preserve across shuffles."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "win_price_deciles",
    sql="""
    SELECT o_orderkey,
           CAST(ntile(10) OVER w AS BIGINT) AS decile,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM orders WHERE o_orderkey % 20 = 0
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "rank", "analytics"),
)
def win_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deciles + percent_rank of order value. A single
    unpartitioned window is the one shape that CANNOT scale (total
    order on one reducer) — at 100 TB replace with approx_percentile
    cutpoints joined back (see agg_value_percentiles); kept here
    because the ranked-ladder semantics are part of the surface."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "q18_large_orders",
    sql="""
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 4) AS o_totalprice,
           round(t.sum_qty, 4) AS sum_qty
    FROM orders o
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 60
    ) t ON t.l_orderkey = o.o_orderkey
    """,
    tags=("join", "having", "analytics"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join. The HAVING filter runs on
    the aggregated (small) side BEFORE the join, so only qualifying
    orderkeys shuffle into the join — at scale the filtered aggregate
    is broadcastable."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 60)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.round("sum_qty", 4).alias("sum_qty"),
    )


@query(
    "q22_idle_rich_customers",
    sql="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, count(*) AS n_custs,
           round(sum(c.c_acctbal), 4) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    # may-be-empty: at sf ≤ 0.01 every above-average-balance customer
    # happens to have orders (0 rows, first non-empty at sf0.1) — the
    # one registry query legitimately empty at the driver gate scale.
    tags=("join", "subquery", "analytics", "may-be-empty"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + anti join. The
    average is a 1-row broadcast cross join (no driver collect — stays
    one lazy plan); the NOT EXISTS is a left-anti on o_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@query(
    "win_funnel_conversion",
    sql="""
    WITH e AS (
      SELECT user_id, event_id, event_type, ts FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT *,
             max(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_view_ts
      FROM e
    ),
    s2 AS (
      SELECT *,
             (event_type = 'click' AND last_view_ts IS NOT NULL
              AND last_view_ts >= ts - INTERVAL '30 minutes') AS qual_click
      FROM s1
    ),
    s3 AS (
      SELECT *,
             max(CASE WHEN qual_click THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_qual_click_ts
      FROM s2
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
               AS n_views,
           CAST(count(CASE WHEN qual_click THEN 1 END) AS BIGINT)
               AS n_funnel_clicks,
           CAST(count(CASE WHEN event_type = 'purchase'
                            AND last_qual_click_ts IS NOT NULL
                            AND last_qual_click_ts >= ts - INTERVAL '30 minutes'
                           THEN 1 END) AS BIGINT) AS n_funnel_purchases
    FROM s3 GROUP BY 1
    """,
    tags=("window", "analytics", "temporal"),
)
def win_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click ≤30 min → purchase ≤30 min)
    computed with WINDOW functions, not self-joins: each event carries
    the timestamp of the last preceding step via a running
    conditional-MAX frame, so the whole funnel is ONE shuffle on
    user_id reused by both window passes and the final rollup — the
    shape that survives 100 TB where an events×events interval join
    (the st_click_purchase_pairs demo shape) quadratically would not.
    Tie-stable: frames order by (ts, event_id)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "event_type", "ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    half_hour = F.expr("INTERVAL 30 MINUTES")
    s1 = ev.withColumn(
        "last_view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "qual_click",
        (F.col("event_type") == "click")
        & F.col("last_view_ts").isNotNull()
        & (F.col("last_view_ts") >= F.col("ts") - half_hour),
    )
    s3 = s2.withColumn(
        "last_qual_click_ts",
        F.max(F.when(F.col("qual_click"), F.col("ts"))).over(w),
    )
    return s3.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).cast("bigint").alias("n_views"),
        F.count(F.when(F.col("qual_click"), 1)).cast("bigint").alias("n_funnel_clicks"),
        F.count(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("last_qual_click_ts").isNotNull()
                & (F.col("last_qual_click_ts") >= F.col("ts") - half_hour),
                1,
            )
        )
        .cast("bigint")
        .alias("n_funnel_purchases"),
    ).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "n_views",
        "n_funnel_clicks",
        "n_funnel_purchases",
    )


@query(
    "agg_profile_documents",
    sql="""
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           count(*) - count(doc_id) AS n_nulls,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_val,
           CAST(max(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           min(lang), max(lang) FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source),
           count(DISTINCT source), min(source), max(source) FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars),
           count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
           CAST(max(n_chars) AS VARCHAR) FROM documents
    """,
    tags=("agg", "analytics", "profile"),
)
def agg_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (the `df.summary()`-class utility an
    engine owes its users, made deterministic and oracle-checkable):
    one row per column with null count, exact distinct count, and
    min/max rendered as strings. ONE pass over the scan computes every
    aggregate (multi-distinct plans via Spark's expand), then an
    unpivot reshapes driver-side-free. At 100 TB the exact distincts
    swap for approx_count_distinct (HLL, mergeable) with no shape
    change; min/max/nulls come from parquet footers for free."""
    d = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
    ).select(
        F.col("col_name").cast("string").alias("col_name"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.col("min_val").cast("string").alias("min_val"),
        F.col("max_val").cast("string").alias("max_val"),
    )


def _skew_audit_sql() -> str:
    parts = []
    for col in ("l_orderkey", "l_suppkey", "l_partkey"):
        parts.append(f"""
    SELECT '{col}' AS key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(quantile_cont(cnt, 0.50), 4) AS p50_cnt,
           round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           round(max(cnt) / quantile_cont(cnt, 0.50), 4) AS skew_ratio
    FROM (SELECT {col}, count(*) AS cnt FROM lineitem GROUP BY 1)""")
    return "\n    UNION ALL\n".join(parts)


@query(
    "agg_skew_audit",
    sql=_skew_audit_sql(),
    tags=("agg", "analytics", "scale"),
)
def agg_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit — the diagnostic that picks between a
    plain shuffle, AQE skew splitting, and explicit salting
    (operators/skew.py): per candidate join/agg key, the key-frequency
    distribution (max, p50, p99, max/p50 ratio). Each key costs one
    map-side-combined count shuffle + a one-row rollup; at 100 TB run
    it over a hash-sample of keys (the distribution survives
    sampling), or read row-group counts from parquet footers when the
    key is the layout column."""
    li = load_table(spark, sf_dir, "lineitem")
    outs = []
    for col in ("l_orderkey", "l_suppkey", "l_partkey"):
        cnt = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        outs.append(
            cnt.agg(
                F.lit(col).alias("key_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.max("cnt").cast("bigint").alias("max_cnt"),
                F.round(F.expr("percentile(cnt, 0.50)"), 4).alias("p50_cnt"),
                F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
                F.round(
                    F.max("cnt") / F.expr("percentile(cnt, 0.50)"), 4
                ).alias("skew_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query(
    "win_sessionize_ids",
    sql="""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(sum(is_start) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_idx
    FROM e
    """,
    tags=("window", "analytics", "temporal"),
)
def win_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event sessionization (gaps-and-islands): a session break is
    a >30-min gap since the user's previous event; the running sum of
    break flags IS the session index. The per-event twin of the
    w_session_windows aggregate — lag + cumulative sum over the SAME
    (user_id, ts) ordering, so both windows share one shuffle.
    Tie-stable via the event_id tiebreak."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(order)
    e = ev.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    return e.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.sum("is_start")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_idx"),
    )


@query(
    "t_topk_per_group",
    sql="""
    SELECT o_custkey, o_orderkey, total_price, rnk FROM (
      SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
             CAST(o_orderkey AS BIGINT) AS o_orderkey,
             round(o_totalprice, 4) AS total_price,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
      FROM orders) t
    WHERE rnk <= 3
    """,
    tags=("window", "topk", "analytics"),
)
def t_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (top-3 orders per customer) — the per-group
    LIMIT shape. Spark plans this as WindowGroupLimit (plan-gated):
    per-partition top-k heaps run BEFORE the group shuffle, so the
    exchange carries at most k rows per (group, input partition)
    instead of the whole fact — the difference between shuffling 3
    rows and 30 000 per hot customer at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.round("o_totalprice", 4).alias("total_price"),
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "agg_audience_overlap",
    sql="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
    SELECT p.type_a, p.type_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           round(p.n_both * 1.0 / (sa.n + sb.n - p.n_both), 4) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
    tags=("agg", "analytics"),
)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, the
    distinct-user intersection and Jaccard — the segment-overlap
    report. ONE distinct pass on (user, type), then a self-join whose
    left side is user-bucketed (5 types → ≤10 rows per user); the
    tiny per-type sizes broadcast back. At 100 TB the exact distinct
    pass swaps for theta sketches (mergeable set intersection) with
    the same output shape."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_both") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
    )


@query(
    "agg_retention_cohorts",
    sql="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    marked AS (
      SELECT e.user_id,
             CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
             CAST(floor(date_diff('day', date_trunc('week', f.first_ts),
                                  date_trunc('week', e.ts)) / 7) AS BIGINT)
                 AS weeks_since
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           weeks_since,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
    FROM marked GROUP BY 1, 2
    """,
    tags=("agg", "analytics", "temporal"),
)
def agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, per
    (cohort, weeks-since-first) distinct actives — the standard
    retention triangle. One shuffle computes the per-user first-seen
    (map-side partial MIN), broadcast back into the scan, then one
    distinct-agg on (cohort, offset, user). Weeks are computed as
    whole weeks between week-truncated timestamps so both engines
    bucket identically across DST-free UTC weeks."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    marked = ev.join(F.broadcast(firsts), "user_id").select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("first_ts")), "yyyy-MM-dd").alias(
            "cohort_week"
        ),
        F.floor(
            F.datediff(
                F.date_trunc("week", F.col("ts")),
                F.date_trunc("week", F.col("first_ts")),
            )
            / 7
        )
        .cast("bigint")
        .alias("weeks_since"),
    )
    return marked.groupBy("cohort_week", "weeks_since").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_active")
    )


@query(
    "win_pareto_frontier",
    sql="""
    WITH pts AS (
      SELECT round(o_totalprice, 2) AS price,
             CAST(o_orderdate AS DATE) AS d,
             min(o_orderkey) AS okey
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT price, d, okey,
             max(d) OVER (ORDER BY price DESC, d DESC, okey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_d
      FROM pts
    )
    SELECT CAST(okey AS BIGINT) AS o_orderkey,
           price AS total_price,
           strftime(d, '%Y-%m-%d') AS order_date
    FROM ranked WHERE best_d IS NULL OR best_d < d
    """,
    tags=("window", "analytics", "skyline", "extension"),
)
def win_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of orders over (total price, order
    date), both maximized: the orders no other order beats on both
    dimensions. Exact-duplicate points collapse to their min key
    first; then a price-descending sweep keeps a point iff no
    already-seen point has date ≥ its own — the classic one-pass 2-D
    skyline.

    Scale: computed in TWO phases — local frontiers inside hash
    buckets (parallel windows; any subset's frontier is a superset of
    the global frontier's members in it, so no candidate is lost),
    then the global sweep over the few survivors. The oracle runs the
    single global sweep, so the hash match PROVES the two-phase
    decomposition equals the naive plan."""
    o = load_table(spark, sf_dir, "orders")
    pts = (
        o.groupBy(
            F.round("o_totalprice", 2).alias("price"),
            F.col("o_orderdate").alias("d"),
        )
        .agg(F.min("o_orderkey").alias("okey"))
    )

    def sweep(df: DataFrame, part_col: str | None) -> DataFrame:
        w = (
            Window.partitionBy(part_col)
            if part_col
            else Window.partitionBy(F.lit(1))
        )
        w = w.orderBy(
            F.desc("price"), F.desc("d"), F.asc("okey")
        ).rowsBetween(Window.unboundedPreceding, -1)
        return df.withColumn("best_d", F.max("d").over(w)).filter(
            F.col("best_d").isNull() | (F.col("best_d") < F.col("d"))
        ).drop("best_d")

    local = sweep(
        pts.withColumn("_b", F.pmod(F.col("okey"), F.lit(16))), "_b"
    ).drop("_b")
    return sweep(local, None).select(
        F.col("okey").cast("long").alias("o_orderkey"),
        F.col("price").alias("total_price"),
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
    )


@query(
    "agg_bitmap_audience_overlap",
    sql="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    bm AS (
      SELECT event_type, user_id // 63 AS w,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INTEGER)) AS bits
      FROM ut GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
    FROM bm a JOIN bm b ON a.w = b.w AND a.event_type < b.event_type
    GROUP BY 1, 2
    HAVING sum(bit_count(a.bits & b.bits)) > 0
    """,
    tags=("agg", "setop", "bitmap", "analytics", "extension"),
)
def agg_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience intersection via EXACT BITMAPS (the roaring-bitmap
    warehouse pattern): each event type's user set packs into 64-bit
    words (bit_or per word index, map-side combinable), pairwise
    intersections are AND + popcount over aligned words — set algebra
    on integers instead of a user-level self-join. Must equal
    `agg_audience_overlap`'s join-based counts (asserted in pytest on
    top of the oracle).

    Scale: the bitmap table is O(types × user-space/64) words — at
    100 TB the per-type user shuffle collapses ~64× into words before
    the pair join, and word chunks join co-partitioned on the word
    index. Sparse user-id spaces want the roaring container variant;
    the dense-word arithmetic here is its inner loop."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    # 63-bit words: shifting into bit 63 overflows a signed BIGINT in
    # ANSI engines (DuckDB errors), so the top bit stays unused
    bm = ut.groupBy(
        "event_type", F.expr("user_id div 63").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
        ).alias("bits")
    )
    a, b = bm.alias("a"), bm.alias("b")
    common = F.sum(F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits"))))
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(common.cast("long").alias("n_both"))
        .filter(F.col("n_both") > 0)
    )


@query(
    "agg_exact_quantile_twopass",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN value END) AS p50_exact,
           max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN value END) AS p90_exact
    FROM ranked GROUP BY event_type
    """,
    tags=("agg", "percentile", "scale", "analytics"),
)
def agg_exact_quantile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group discrete quantiles (lower convention: the value
    at 1-based rank floor((n-1)·q)+1) WITHOUT sorting any group — the
    'exact median of 100 TB' selection algorithm:

    pass 1: bucket every value by a fixed quantization (floor(v·8) —
      value-monotonic, so bucket order IS value order and equal values
      can never straddle a boundary), roll up per-(group, bucket)
      counts, and cumulative-sum them over the SMALL histogram table
      (O(groups·buckets) rows) to locate, per quantile, the one bucket
      holding the target rank and the residual offset k inside it;
    pass 2: re-scan with the tiny (group, bucket, q, k) spec broadcast
      — only rows of target buckets survive the join — and pick the
      k-th smallest value inside each via row_number.

    The full sort the oracle runs is O(n log n) shuffle-heavy per
    group; this plan's big-data work is two scans + one histogram
    rollup, and the only row-level ordering happens inside ONE bucket
    per (group, quantile) — n/buckets rows. At 100 TB with heavier
    bucket skew, the same spec-join step recurses (re-bucket the one
    target bucket by floor(v·8·B)) instead of widening the window;
    one level suffices at every tested SF. Equal values within a
    bucket make row_number ranks arbitrary among themselves, but the
    VALUE at any rank is unique, so the answer is engine-stable with
    no float rounding at all (the selected values are raw stored
    doubles, never sums)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ev = ev.withColumn("bucket", F.floor(F.col("value") * 8).cast("long"))
    counts = ev.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).alias("c"))
    # cum (ordered) and n (whole-partition) share one event_type
    # exchange+sort of the SMALL histogram; both quantiles come out of
    # the same pass via an explode, so the histogram subtree is built
    # exactly once (a per-quantile union would rescan events per q).
    wb = Window.partitionBy("event_type").orderBy("bucket")
    wall = Window.partitionBy("event_type")
    hist = counts.withColumn("cum", F.sum("c").over(wb)).withColumn(
        "n", F.sum("c").over(wall)
    )
    spec = (
        hist.select(
            "event_type",
            "bucket",
            "c",
            "cum",
            "n",
            F.explode(F.array(F.lit(50), F.lit(90))).alias("q"),
        )
        .withColumn("r", F.expr("(n - 1) * q div 100 + 1"))
        .filter(
            (F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("c") < F.col("r"))
        )
        .select(
            "event_type",
            "bucket",
            "q",
            (F.col("r") - (F.col("cum") - F.col("c"))).alias("k"),
        )
    )
    hit = ev.join(F.broadcast(spec), ["event_type", "bucket"])
    wq = Window.partitionBy("event_type", "q").orderBy("value")
    sel = hit.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") == F.col("k")
    )
    return sel.groupBy("event_type").agg(
        F.max(F.when(F.col("q") == 50, F.col("value"))).alias("p50_exact"),
        F.max(F.when(F.col("q") == 90, F.col("value"))).alias("p90_exact"),
    )


@query(
    "agg_k_anonymity_audit",
    sql="""
    WITH qi AS (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               c.c_custkey
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    grp AS (
        SELECT nation, segment, bal_band, CAST(count(*) AS BIGINT) AS n
        FROM qi GROUP BY nation, segment, bal_band
    )
    SELECT nation, segment, bal_band, n
    FROM grp WHERE n < 5
    """,
    tags=("agg", "privacy", "analytics", "extension"),
)
def agg_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney'02) over the customer table — the
    re-identification scan a training-data pipeline runs before
    releasing tabular records: group by the quasi-identifier tuple
    (nation, market segment, account-balance band) and surface every
    group smaller than k=5, whose members a linker could single out.

    Scale shape: the band is a fixed-width bucket (floor(bal/1000) —
    a pure projection, identical IEEE arithmetic in both engines),
    NOT an ntile, so there is no global ordering; the audit is one
    QI-keyed aggregate with the nation dim broadcast. Companion to
    corpus_pii_redaction (plans/pipeline_ops.py) on the privacy axis;
    the reference has no privacy surface (training-data extension).

    Scale proof (r11): fixture v1's verbatim tiling made every QI
    cell count a multiple of the copy count, so the sf1/sf10 ledger
    rows hashed empty-vs-empty (r10 finding). Fixture v2
    (tools/gen_sf1.py) plants ~1/2000 deterministic balance outliers
    on copies ≥ 1; the audit now surfaces 67 violation cells at sf1
    and 616 at sf10, oracle-hash-verified — executed rows, not a
    construction argument. An empty audit on clean data remains the
    genuine all-clear outcome, so k stays the privacy parameter k=5."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    qi = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    )
    return (
        qi.groupBy("nation", "segment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") < 5)
    )
