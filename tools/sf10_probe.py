"""sf10 Spark-wall probe (r7 verdict item 3): one more order of
magnitude above the sf1 sweep for the families whose scale behavior
carries the 100 TB claim. Runs each query's SPARK side only (the
DuckDB twins are already quadratic at sf1) at sf0.1 / sf1 / sf10 in
ONE session and prints per-query walls plus the fitted scaling
exponent alpha where wall ~ SF^alpha (alpha <= ~1 = linear-or-better;
sub-linear is common at small SF because fixed job overhead
amortizes).

Usage: python tools/sf10_probe.py [name ...]   (default: the heavy-six)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Two registry queries are intentionally absent from the default list
# (measured r8, SCALING.md §sf10): w1_flagship_occurrence_scan's
# fixture derives songs from the same table as transcripts, so scored
# pairs grow quadratically with SF (GC-thrashes at sf10 — run
# tools/w1_scale_probe.py instead, which pins the catalog); and
# dedup_lsh_recall's exact-AllPairs ground truth goes quadratic in
# prefix-bucket occupancy on the vocab-saturated tiled corpus (run its
# production-shaped sampled eval instead).
HEAVY_SIX = [
    "dedup_minhash_lsh",
    "corpus_dedup_components",
    "corpus_dsir_select",
    "text_bpe_encode_docs",
    "text_unigram_encode_docs",
    "search_bm25_topk",
]

SFS = [
    ("/root/testdata/sf0.1", 0.1),
    (".localdata/sf1", 1.0),
    (".localdata/sf10", 10.0),
]


def main() -> None:
    names = sys.argv[1:] or HEAVY_SIX
    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.session import get_spark

    spark = get_spark("sf10-probe")
    qs = all_queries()
    # size scan splits for the largest single-file input at sf10, the
    # same single-file-local repair bench.py documents
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

    out = {}
    for name in names:
        q = qs[name]
        try:
            q.fn(spark, "/root/testdata/sf0.001").count()  # codegen warm
        except Exception:
            pass
        walls = {}
        for sf_dir, sf in SFS:
            if not os.path.isdir(sf_dir):
                continue
            t0 = time.perf_counter()
            n = q.fn(spark, sf_dir).count()
            walls[sf] = round(time.perf_counter() - t0, 2)
            print(f"{name} sf{sf}: {walls[sf]}s rows={n}", flush=True)
        rec = {"walls": walls}
        if 1.0 in walls and 10.0 in walls:
            rec["alpha_1_to_10"] = round(
                math.log(walls[10.0] / walls[1.0]) / math.log(10), 3
            )
        if 0.1 in walls and 1.0 in walls:
            rec["alpha_01_to_1"] = round(
                math.log(walls[1.0] / walls[0.1]) / math.log(10), 3
            )
        out[name] = rec
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
