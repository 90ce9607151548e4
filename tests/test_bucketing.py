"""Bucketed-table co-located join: the physical proof that
pre-bucketing both sides of a repeated join key deletes the per-query
exchanges — the SCALING.md §Joins recipe ("if the join repeats on
this key, bucket both sides") actually executed, not just asserted in
prose.

Writes orders and lineitem as parquet tables bucketed 8 ways on the
order key into a scratch warehouse, then:
- joins the two bucketed tables and asserts the physical plan holds
  a SortMergeJoin with ZERO Exchange operators (bucket layout
  satisfies the join's distribution requirement on both sides);
- asserts the same join over the plain parquet shuffles both sides;
- asserts result parity between the two plans.

At 100 TB this is the difference between re-shuffling the fact table
on every join and shuffling once at write time — the Delta/Iceberg
OPTIMIZE-by-bucket layout without the table format.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firefly_vcut_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        tbl = f"b_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, sf_dir, name)
            .write.format("parquet")
            .option("path", str(wh / tbl))  # external: no warehouse conf
            .bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _joined(o, li):
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable broadcast so the join must satisfy its distribution
    # requirement — from the bucket layout, not an exchange (at real
    # fact-fact scale broadcast is off the table anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = bucketed_tables
        df = _joined(spark.table(bo), spark.table(bl))
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final or "ShuffledHashJoin" in final
        # everything at/below the join must be exchange-free: the only
        # Exchange allowed in the whole plan is the rollup's
        join_down = final.split("MergeJoin")[-1]
        assert "Exchange" not in join_down, join_down
        assert final.count("Exchange") <= 1, final
        assert "Bucketed: true" in final
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_plain_join_shuffles_both_sides(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        df = _joined(o, li)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        post_join = plan.split("MergeJoin")[-1] if "MergeJoin" in plan else plan
        assert plan.count("Exchange") >= 2, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_and_plain_agree(spark, sf_dir, bucketed_tables):
    bo, bl = bucketed_tables
    bucketed = {
        r["o_orderpriority"]: (r["n"], r["total"])
        for r in _joined(spark.table(bo), spark.table(bl)).collect()
    }
    plain = {
        r["o_orderpriority"]: (r["n"], r["total"])
        for r in _joined(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        ).collect()
    }
    assert bucketed == plain


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on the
    join key, joined to a SELECTIVE dim, must plan a dynamicpruning
    subquery on the partition column — at 100 TB this is what keeps a
    star join from scanning every partition. Verified both in the
    plan text and by result parity with the unpartitioned join."""
    from pyspark.sql import functions as F

    from firefly_vcut_spark.sources.catalog import load_table

    fact_dir = str(tmp_path / "ev_by_type")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # DPP fires on a SELECTIVE PREDICATE over a scanned dim — a literal
    # LocalRelation has no filter to derive the pruning subquery from,
    # so materialize the dim and filter it
    dim_dir = str(tmp_path / "type_dim")
    spark.createDataFrame(
        [
            ("click", 1.0, "hot"),
            ("purchase", 3.0, "hot"),
            ("view", 1.0, "cold"),
            ("signup", 1.0, "cold"),
            ("error", 1.0, "cold"),
            ("page", 1.0, "cold"),
        ],
        ["event_type", "weight", "tier"],
    ).write.parquet(dim_dir)
    dim = (
        spark.read.parquet(dim_dir)
        .filter(F.col("tier") == "hot")
        .select("event_type", "weight")
    )
    joined = (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("wv"),
        )
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    plain = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("wv"),
        )
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )
