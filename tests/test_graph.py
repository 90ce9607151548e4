"""Graph-operator invariants on known graphs: exact triangle counts,
orientation-vs-naive cross-check on random graphs, and PageRank
sanity (symmetry on regular graphs, hub concentration on stars)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.graph import (
    degrees,
    pagerank_quantized,
    triangle_stats,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], ["u", "v"]
    ).distinct()


def test_triangles_known_graphs(spark):
    """K4 has 4 triangles; a 5-cycle has none; K4 plus a pendant
    vertex still has 4."""
    k4 = _edges_df(spark, itertools.combinations(range(4), 2))
    assert triangle_stats(k4).collect()[0]["n_triangles"] == 4
    c5 = _edges_df(spark, [(i, (i + 1) % 5) for i in range(5)])
    row = triangle_stats(c5).collect()[0]
    assert row["n_triangles"] == 0 and row["n_edges"] == 5
    k4p = _edges_df(
        spark, list(itertools.combinations(range(4), 2)) + [(3, 9)]
    )
    row = triangle_stats(k4p).collect()[0]
    assert row["n_triangles"] == 4 and row["n_nodes"] == 5


def test_triangles_random_vs_bruteforce(spark):
    """Degree-ordered wedge counting equals the brute-force triple
    scan on random G(n, p) graphs (ties in degree included)."""
    rng = random.Random(11)
    for trial in range(3):
        n, p = 14, 0.4
        pairs = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < p
        ]
        adj = set(pairs)
        brute = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in adj and (a, c) in adj and (b, c) in adj
        )
        got = triangle_stats(_edges_df(spark, pairs)).collect()[0][
            "n_triangles"
        ]
        assert got == brute, (trial, got, brute)


def test_pagerank_uniform_on_regular_graph(spark):
    """On a vertex-transitive graph (a cycle) every node has the same
    rank at every iteration."""
    c6 = _edges_df(spark, [(i, (i + 1) % 6) for i in range(6)])
    rows = pagerank_quantized(c6, iters=3).collect()
    assert len({r["rank"] for r in rows}) == 1


def test_pagerank_hub_dominates_star(spark):
    """On a star graph the hub outranks every leaf, and leaves tie."""
    star = _edges_df(spark, [(0, i) for i in range(1, 9)])
    rows = {r["node"]: r["rank"] for r in pagerank_quantized(star, iters=4).collect()}
    hub = rows.pop(0)
    assert all(hub > v for v in rows.values())
    assert len(set(rows.values())) == 1


def test_degrees_sum_is_twice_edges(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)]
    deg = degrees(_edges_df(spark, pairs))
    assert deg.agg(F.sum("deg")).collect()[0][0] == 2 * len(pairs)


def test_pagerank_local_equals_distributed(spark):
    """The size-gated solvers compute the identical int64 fixpoint:
    force each path on the same random graph and compare exact
    ranks (the CC-solver cross-check discipline)."""
    rng = random.Random(7)
    pairs = {
        (a, b)
        for a, b in (
            sorted(rng.sample(range(40), 2)) for _ in range(120)
        )
    }
    g = _edges_df(spark, pairs)
    local = {
        (r["node"]): (r["deg"], r["rank"])
        for r in pagerank_quantized(g, iters=5, local_threshold=10**9).collect()
    }
    dist = {
        (r["node"]): (r["deg"], r["rank"])
        for r in pagerank_quantized(g, iters=5, local_threshold=0).collect()
    }
    assert local == dist and len(local) > 0
