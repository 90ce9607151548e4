"""Paired A/B for corpus_dsir_select at two core counts (VERDICT r11
item 1): run the query under bench.py's exact per-query tuning at
local[$SPARK_GRAFT_CPUS], 5 reps, alongside the same-session DuckDB
oracle wall as drift control. Invoke twice (SPARK_GRAFT_CPUS=32 / 8)
back-to-back so both runs share one host window.

Usage: SPARK_GRAFT_CPUS=32 python tools/dsir_ab.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = sys.argv[1:] or ["corpus_dsir_select"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))


def main() -> None:
    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.session import get_spark

    spark = get_spark("dsir-ab")
    qs = all_queries()

    # mirror bench.py's tune() for a non-latency query
    try:
        largest = max(
            os.path.getsize(os.path.join(SF_DIR, f))
            for f in os.listdir(SF_DIR)
            if f.endswith(".parquet")
        )
    except (OSError, ValueError):
        largest = 128 << 20
    cores = spark.sparkContext.defaultParallelism
    split_bytes = min(128 << 20, max(1 << 20, largest // (2 * cores)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"),
    )

    spark.range(1).count()
    out = {"cpus": cores, "sf_dir": SF_DIR}
    for name in QUERIES:
        qs[name].fn(spark, "/root/testdata/sf0.001").count()  # warm codegen
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name].fn(spark, SF_DIR).count()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"walls": walls, "best": min(walls)}

        sql = qs[name].sql
        if sql:
            import duckdb

            con = duckdb.connect()
            for t in [
                "region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings",
            ]:
                con.execute(
                    f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
                )
            con.execute(sql).fetchall()  # warm
            dwalls = []
            for _ in range(min(REPS, 3)):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dwalls.append(round(time.perf_counter() - t0, 3))
            out[name]["duckdb"] = {"walls": dwalls, "best": min(dwalls)}
            con.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
