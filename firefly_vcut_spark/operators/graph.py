"""Graph analytics over a self-derived co-activity graph: triangle
counting (degree-ordered orientation) and integer-quantized PageRank.

The engine's graph story so far is connected components
(operators/corpus.py — the dedup-cluster solver); these add the two
other staples a distributed engine is expected to run on
relationship data, built the same way CC is: plain DataFrame joins,
deterministic integer arithmetic, every step SQL-replayable.

Graph derivation (`cooccurrence_edges`): users co-active in the same
time bucket, with buckets above a hot cap DROPPED — the same
bounded-fan-out principle as the LSH band cap and the winnowing
stop-gram cap. At 100 TB a raw co-occurrence projection is
quadratically dense in bucket size; the cap makes the edge count
O(buckets · cap²) by construction.

Triangle counting uses the standard degree-ordered orientation
(each edge directed from the (deg, id)-smaller endpoint), which
bounds the wedge-join fan-out by the ORIENTED out-degree — O(sqrt(m))
per node on skewed graphs instead of O(max degree) — the
MapReduce-era trick (Suri & Vassilvitskii) that makes the join plan
survive power-law graphs.

PageRank runs d = 17/20 damping entirely in BIGINT (ranks scaled to
1e12, per-step floor division), so five rounds are bit-identical
under any partitioning and the oracle can replay them as five
unrolled CTEs — same recipe that made the PCA power iteration
(operators/linalg.py) hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12
_DAMP_NUM, _DAMP_DEN = 17, 20  # d = 0.85 as an exact rational


def cooccurrence_edges(
    events: DataFrame,
    event_type: str = "purchase",
    min_bucket: int = 2,
    max_bucket: int = 15,
) -> DataFrame:
    """Undirected co-activity edges (u < v): distinct user pairs that
    share an hour bucket of the given event type, skipping buckets
    with more than ``max_bucket`` users (hot-key cap — keeps the
    pair fan-out per bucket bounded at C(cap, 2))."""
    pu = (
        events.filter(F.col("event_type") == event_type)
        .select(
            F.date_trunc("hour", "ts").alias("h"),
            "user_id",
        )
        .distinct()
    )
    keep = (
        pu.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(
            (F.col("nh") >= min_bucket) & (F.col("nh") <= max_bucket)
        )
        .select("h")
    )
    kpu = pu.join(keep, "h")
    a, b = kpu.alias("a"), kpu.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) over undirected (u < v) edges."""
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row graph summary: node/edge/triangle counts and global
    transitivity (3·T / wedges).

    Orientation: every edge directed from its (deg, id)-smaller
    endpoint; a triangle {a,b,c} is counted exactly once, as the
    wedge at its smallest vertex closed by the oriented (mid → max)
    edge. The wedge self-join fans out by oriented out-degree only."""
    deg = degrees(edges)
    e = (
        edges.join(
            deg.withColumnRenamed("node", "u").withColumnRenamed(
                "deg", "du"
            ),
            "u",
        )
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed(
                "deg", "dv"
            ),
            "v",
        )
    )
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_u, F.struct("dv", "v")).otherwise(
            F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))
        ).alias("t"),
    ).select("s", F.col("t.v").alias("t"), F.col("t.dv").alias("dt"))
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    # wedge (s → a, s → b) ordered by the same (deg, id) rank so the
    # closing edge (a → b) exists in oriented form iff the triangle does
    wedges = w1.join(
        w2,
        (F.col("w1.s") == F.col("w2.s"))
        & (
            (F.col("w1.dt") < F.col("w2.dt"))
            | (
                (F.col("w1.dt") == F.col("w2.dt"))
                & (F.col("w1.t") < F.col("w2.t"))
            )
        ),
    ).select(F.col("w1.t").alias("a"), F.col("w2.t").alias("b"))
    closing = oriented.select(
        F.col("s").alias("a"), F.col("t").alias("b")
    )
    tri = wedges.join(closing, ["a", "b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    summary = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    return summary.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.round(
            3.0
            * F.col("n_triangles").cast("double")
            / F.col("n_wedges").cast("double"),
            4,
        ).alias("transitivity"),
    )


def pagerank_quantized(
    edges: DataFrame, iters: int = 5, scale: int = PAGERANK_SCALE
) -> DataFrame:
    """PageRank over the undirected graph in exact BIGINT arithmetic:
    ranks scaled to ``scale``, r ← base + (17 · Σ_{u~v} (r_u div
    deg_u)) div 20 with base = ((3·scale) div 20) div N. Every step is
    integer division, so ``iters`` rounds are deterministic under any
    partitioning — replayable as unrolled SQL CTEs.

    Returns (node, deg, rank). The per-round shuffle is one join on
    the edge source + one groupBy on the target; lineage is truncated
    per round (localCheckpoint) exactly like the CC solver's rounds."""
    # materialize the edge derivation ONCE: every round joins against
    # `both` and `deg`, and without the checkpoint the (possibly
    # expensive) upstream edge pipeline re-executes per round
    edges = edges.localCheckpoint(eager=True)
    deg = degrees(edges).localCheckpoint(eager=True)
    both = edges.select(
        F.col("u").alias("s"), F.col("v").alias("t")
    ).unionAll(edges.select(F.col("v").alias("s"), F.col("u").alias("t")))
    n_nodes = deg.count()
    base = (3 * scale // _DAMP_DEN) // n_nodes
    ranks = deg.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("pr")
    )
    src_deg = deg.withColumnRenamed("node", "s").withColumnRenamed(
        "deg", "sdeg"
    )
    for _ in range(iters):
        contrib = (
            both.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(src_deg, "s")
            .select(
                "t", F.expr("pr div sdeg").alias("c")
            )
        )
        ranks = (
            contrib.groupBy("t")
            .agg(
                (
                    F.lit(base)
                    + F.expr(f"({_DAMP_NUM} * sum(c)) div {_DAMP_DEN}")
                )
                .cast("long")
                .alias("pr")
            )
            .withColumnRenamed("t", "node")
            .localCheckpoint(eager=False)
        )
    return ranks.join(deg, "node").select(
        "node", "deg", F.col("pr").alias("rank")
    )
