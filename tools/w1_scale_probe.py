"""w1 flagship scaling probe with a FIXED song catalog (r8).

The registry fixture derives songs from the same documents table as
the transcripts, so at sfN BOTH sides scale and the scored-pair count
grows ~quadratically with SF (14.7k output rows at sf0.1 → 1.47M at
sf1) — a fixture artifact that OOMs a naive sf10 run and measures
nothing about the engine. A real deployment scans a growing corpus
against a FIXED catalog, so this probe pins songs to the sf0.1 tile
(constant dimension) and scales only the transcript side — wall vs SF
is then the engine's corpus-scaling behavior for the windowed fuzzy
scan (broadcast dim, per-row window assembly, Arrow-batched LCS).

Usage: python tools/w1_scale_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [
    ("/root/testdata/sf0.1", 0.1),
    (".localdata/sf1", 1.0),
    (".localdata/sf10", 10.0),
]
FIXED_DIM_SF = "/root/testdata/sf0.1"


def main() -> None:
    from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
    from firefly_vcut_spark.session import get_spark
    from firefly_vcut_spark.sources import fixtures as fx

    spark = get_spark("w1-scale-probe")
    try:
        largest = max(
            os.path.getsize(os.path.join(SFS[-1][0], f))
            for f in os.listdir(SFS[-1][0])
            if f.endswith(".parquet")
        )
    except (OSError, ValueError):
        largest = 128 << 20
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(min(128 << 20, max(1 << 20, largest // (2 * cores)))),
    )

    songs = fx.songs(spark, FIXED_DIM_SF)
    # warm codegen + Arrow path once
    fuzzy_occurrence_scan(fx.segments(spark, "/root/testdata/sf0.001"), songs).count()

    walls = {}
    for sf_dir, sf in SFS:
        if not os.path.isdir(sf_dir):
            continue
        t0 = time.perf_counter()
        n = fuzzy_occurrence_scan(fx.segments(spark, sf_dir), songs).count()
        walls[sf] = round(time.perf_counter() - t0, 2)
        print(f"w1 fixed-dim sf{sf}: {walls[sf]}s rows={n}", flush=True)
    out = {"walls": walls, "fixed_dim": FIXED_DIM_SF}
    if 1.0 in walls and 10.0 in walls:
        out["alpha_1_to_10"] = round(
            math.log(walls[10.0] / walls[1.0]) / math.log(10), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
