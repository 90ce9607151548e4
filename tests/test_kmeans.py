"""Full-data Lloyd k-means: planted-structure recovery and the
engine-parity invariants the oracle hash depends on."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from firefly_vcut_spark.plans.kmeans_sql import (
    _best_cell,
    _quantized,
    _seed_centroids,
    _update,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _blobs(spark, centers, per=6, dim=4, spread=0.01):
    """Well-separated deterministic blobs: center ± tiny offsets."""
    rows = []
    vid = 0
    for b, c in enumerate(centers):
        for i in range(per):
            off = spread * ((i % 3) - 1)
            rows.append((vid, [float(c[d] + off) for d in range(dim)], b))
            vid += 1
    return spark.createDataFrame(rows, _SCHEMA)


def test_recovers_planted_blobs(spark):
    centers = [[0.0] * 4, [0.4] * 4, [-0.4] * 4]
    q = _quantized(_blobs(spark, centers))
    cents = _seed_centroids(q, 3)
    for _ in range(3):
        cents = _update(q, cents)
    asg = q.select("vec_id", "label", _best_cell(cents)["cell"].alias("cell"))
    rows = asg.collect()
    # every blob lands in exactly one cell, and no cell mixes blobs
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, set()).add(r.cell)
    cells = [c for s in by_label.values() for c in s]
    assert all(len(s) == 1 for s in by_label.values()), by_label
    assert len(set(cells)) == 3


def test_empty_cell_keeps_previous_centroid(spark):
    # 2 blobs but k=3: one seed can end up owning nothing after the
    # first update; its centroid must persist unchanged (the oracle's
    # COALESCE path)
    centers = [[0.3] * 4, [-0.3] * 4]
    q = _quantized(_blobs(spark, centers))
    cents = _seed_centroids(q, 3)
    nxt = _update(q, cents)
    asg = q.select(_best_cell(nxt)["cell"].alias("cell"))
    live = {r.cell for r in asg.collect()}
    dead = set(range(3)) - live
    for j in dead:
        assert nxt[j] == cents[j]
    assert len(nxt) == 3


def test_quantization_is_positive_integer_domain(spark):
    q = _quantized(_blobs(spark, [[0.49] * 4, [-0.49] * 4]))
    mn = q.select(F.min(F.array_min("qv")).alias("m")).collect()[0].m
    mx = q.select(F.max(F.array_max("qv")).alias("m")).collect()[0].m
    assert mn > 0, "shift must keep every tick positive (div == // only there)"
    assert mx < 2 * 10**8


def test_assignment_tie_breaks_to_lowest_cell(spark):
    # identical centroids: every vector is equidistant; argmin must
    # pick cell 0 deterministically (array_min struct order)
    q = _quantized(_blobs(spark, [[0.1] * 4]))
    cents = [[100_000_000] * 4, [100_000_000] * 4]
    asg = q.select(_best_cell(cents)["cell"].alias("cell"))
    assert {r.cell for r in asg.collect()} == {0}
