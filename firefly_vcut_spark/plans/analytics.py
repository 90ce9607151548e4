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
