"""Capture .explain("formatted") for the bench headline queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (tag = before/after;
round dir defaults to r12), under the same session tuning bench.py
applies per query, so the captured plan is the plan the bench actually
times.

Usage: python tools/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)

    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.session import get_spark

    spark = get_spark("capture-plans")
    qs = all_queries()
    names = [n for n, q in sorted(qs.items()) if "bench" in q.tags]
    if only:
        # explicit names need not be bench-tagged: non-headline queries
        # whose operators an optimization round touches get snapshots too
        names = [n for n in sorted(qs) if n in only]

    largest = max(
        (os.path.getsize(os.path.join(sf_dir, f)) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=128 << 20,
    )
    cores = spark.sparkContext.defaultParallelism
    split_bytes = min(128 << 20, max(1 << 20, largest // (2 * cores)))

    for name in names:
        latency = "latency" in qs[name].tags
        spark.conf.set("spark.sql.adaptive.enabled", "false" if latency else "true")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            "2" if latency else os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"),
        )
        df = qs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
