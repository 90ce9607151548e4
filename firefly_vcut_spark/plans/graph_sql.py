"""Registered graph-analytics queries: triangle census and quantized
PageRank over the hour-bucket co-purchase-activity graph
(operators/graph.py). The PageRank oracle is five mechanically
unrolled CTE rounds of the same integer recurrence — the
iterative-algorithm-as-hash-checkable pattern shared with
agg_pca_projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.graph import (
    PAGERANK_SCALE,
    cooccurrence_edges,
    pagerank_quantized,
    triangle_stats,
)
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_MINB, _MAXB = 2, 15
_ITERS = 5

_EDGES_CTE = f"""
pu AS (
  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id
  FROM events WHERE event_type = 'purchase'
),
keep AS (
  SELECT h FROM (SELECT h, count(*) AS nh FROM pu GROUP BY h) t
  WHERE nh BETWEEN {_MINB} AND {_MAXB}
),
kpu AS (SELECT pu.h, pu.user_id FROM pu JOIN keep USING (h)),
edges AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM kpu a JOIN kpu b ON a.h = b.h AND a.user_id < b.user_id
),
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges) ends
  GROUP BY node
)
"""


@query(
    "agg_graph_triangles",
    sql=f"""
    WITH {_EDGES_CTE},
    tri AS (
      SELECT count(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    s AS (
      SELECT count(*) AS n_nodes,
             CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
             CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT CAST(s.n_nodes AS BIGINT) AS n_nodes,
           s.n_edges,
           CAST(t.n_triangles AS BIGINT) AS n_triangles,
           round(3.0 * t.n_triangles / s.n_wedges, 4) AS transitivity
    FROM s CROSS JOIN tri t
    """,
    tags=("agg", "graph", "extension"),
)
def agg_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global transitivity of the co-activity
    graph. The Spark side runs the degree-ordered-orientation wedge
    join (fan-out bounded by oriented out-degree — survives power-law
    degree distributions); the oracle counts the same triangles with
    the naive id-ordered 3-way join, so the count equality also
    cross-checks the orientation logic."""
    ev = load_table(spark, sf_dir, "events")
    return triangle_stats(cooccurrence_edges(ev, "purchase", _MINB, _MAXB))


def _pagerank_sql(iters: int = _ITERS, scale: int = PAGERANK_SCALE) -> str:
    n = "(SELECT count(*) FROM deg)"
    base = f"(({3 * scale} // 20) // {n})"
    ctes = [
        "edges2 AS (SELECT u AS s, v AS t FROM edges "
        "UNION ALL SELECT v AS s, u AS t FROM edges)",
        f"r0 AS (SELECT node, {scale} // {n} AS pr FROM deg)",
    ]
    for i in range(iters):
        ctes.append(
            f"""r{i + 1} AS (
  SELECT e.t AS node,
         {base} + (17 * sum(r{i}.pr // d.deg)) // 20 AS pr
  FROM edges2 e
  JOIN r{i} ON r{i}.node = e.s
  JOIN deg d ON d.node = e.s
  GROUP BY e.t
)"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {joined}
    SELECT CAST(r.node AS BIGINT) AS user_id,
           CAST(d.deg AS BIGINT) AS deg,
           CAST(r.pr AS BIGINT) AS rank
    FROM r{iters} r JOIN deg d ON d.node = r.node
    ORDER BY r.pr DESC, r.node
    LIMIT 20
    """


@query(
    "agg_graph_pagerank",
    sql=_pagerank_sql(),
    # "latency": at bench scale the size gate routes the rounds to the
    # driver solver, so the wall is a handful of sub-second stages —
    # AQE's per-stage materialization round trips cost ~30% (measured
    # 1.22 s -> 0.86 s same-session); a gate-big graph on a cluster
    # wants AQE back on, which the session default provides.
    tags=("agg", "graph", "ml", "extension", "bench", "latency"),
)
def agg_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by 5-round quantized PageRank (d = 17/20) on the
    co-activity graph. Ranks live in BIGINT (scale 1e12, floor
    division each step), so the iterative fixpoint is bit-identical
    under any partitioning and the oracle replays all five rounds as
    unrolled CTEs — hash-checked iterative graph ML, like the PCA
    power iteration.

    Scale: per round one shuffle keyed on the edge source join + one
    on the target groupBy; rank/degree state is O(nodes), lineage
    truncated per round.

    Bench note: at sf0.1 the graph is a few hundred edges, so the
    wall is ~5 × Spark's fixed per-round job cost (~0.45 s/round —
    measured r4: AQE on/off and 2-vs-8 shuffle partitions all land
    2.3-2.6 s) rather than data volume; a single-process engine wins
    the toy case, while the per-round shuffles are what scale to
    graphs that don't fit one node."""
    ev = load_table(spark, sf_dir, "events")
    pr = pagerank_quantized(
        cooccurrence_edges(ev, "purchase", _MINB, _MAXB), iters=_ITERS
    )
    return (
        pr.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select(
            F.col("node").cast("long").alias("user_id"),
            F.col("deg").cast("long").alias("deg"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
