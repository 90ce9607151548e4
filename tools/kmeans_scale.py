"""k=256 Lloyd round-wall curve at sf0.1 (VERDICT r7 item 4).

The r7 assignment expression unrolled K zip_with chains, so expression
size (and codegen/analysis time) grew linearly with K. The r8 shape
carries the centroid table as ONE array<array<bigint>> Literal; this
script trains k=256 (32x the oracle query's k=8) over the sf0.1
embeddings and prints the per-round wall — flat across rounds and
bounded vs k=8 proves the expression-size fix, the same measurement
that pinned BPE's checkpointed rep depth (SCALING.md).

Usage: python tools/kmeans_scale.py [k] [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firefly_vcut_spark.plans.kmeans_sql import _quantized, _seed_centroids, _update
from firefly_vcut_spark.session import get_spark
from firefly_vcut_spark.sources.catalog import load_table


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("kmeans-scale")
    q = _quantized(load_table(spark, sf_dir, "embeddings")).persist()
    try:
        n = q.count()  # materialize cache so round walls are pure Lloyd
        t0 = time.time()
        cents = _seed_centroids(q, k)
        seed_wall = time.time() - t0
        walls = []
        for r in range(1, rounds + 1):
            t0 = time.time()
            cents = _update(q, cents)
            walls.append(round(time.time() - t0, 2))
            print(f"round {r}: {walls[-1]}s", flush=True)
        print(
            json.dumps(
                {
                    "k": k,
                    "dim": len(cents[0]),
                    "rows": n,
                    "sf_dir": sf_dir,
                    "seed_wall": round(seed_wall, 2),
                    "round_walls": walls,
                }
            )
        )
    finally:
        q.unpersist()


if __name__ == "__main__":
    main()
