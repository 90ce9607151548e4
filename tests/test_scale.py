"""Scale-technique recipes proven executable: salted aggregation
equals plain aggregation; bucketed tables join WITHOUT an exchange;
AQE skew-join config is live in the session factory."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.skew import salted_aggregate, salted_broadcast_left
from firefly_vcut_spark.sources.catalog import load_table


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.n, round(r.s, 4))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, round(r.total, 4))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            partial_aggs={"c": F.count(F.lit(1)), "q": F.sum("l_quantity")},
            merge_aggs={"n": F.sum("c"), "total": F.round(F.sum("q"), 4)},
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_left_no_fact_shuffle(spark, sf_dir):
    fact = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    out = salted_broadcast_left(fact, dim, ["l_suppkey"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # fact never shuffles
    assert out.count() == fact.count()


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """The co-located-join recipe for two big tables repeatedly joined
    on one key: bucketBy the same key/count on both sides → sort-merge
    join with ZERO Exchange operators."""
    # tables land in the default ./spark-warehouse (gitignored) —
    # spark.sql.warehouse.dir is a static conf and can't be redirected
    # per-test; dropped in finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("orders_b")
        )
        (
            li.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("lineitem_b")
        )
        j = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_session_factory_scale_conf(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

def test_widen_if_narrow_modes(spark, sf_dir, monkeypatch):
    """widen_if_narrow: on a local master it pins full parallelism
    (the historical behaviour, zero probe overhead); in auto/probe
    mode an already-wide input passes through UNCHANGED (the 100 TB
    path — no round-robin exchange of the corpus); never is a no-op."""
    from firefly_vcut_spark.operators.skew import widen_if_narrow

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dp = spark.sparkContext.defaultParallelism

    # local master default: unconditional widen to defaultParallelism
    monkeypatch.delenv("SPARK_GRAFT_WIDEN", raising=False)
    assert widen_if_narrow(docs).rdd.getNumPartitions() == dp

    # never: identical object, no exchange
    monkeypatch.setenv("SPARK_GRAFT_WIDEN", "never")
    assert widen_if_narrow(docs) is docs

    # auto on a genuinely wide input: pass-through (no new exchange);
    # on a narrow input: widened — the at-scale decision rule
    monkeypatch.setenv("SPARK_GRAFT_WIDEN", "auto")
    wide = docs.repartition(dp + 3)
    assert widen_if_narrow(wide) is wide
    narrow = docs.coalesce(1)
    assert widen_if_narrow(narrow).rdd.getNumPartitions() == dp

    # auto must never probe (let alone widen) an exchange-bearing
    # input: under AQE df.rdd materializes the upstream query stages
    # EAGERLY — the shuffle/broadcast jobs would run at probe time and
    # be re-executed when the plan is consumed. Assert pass-through AND
    # that zero jobs ran during the call (the r11 ADVICE regression).
    sc = spark.sparkContext
    joined = docs.join(docs.select("doc_id"), "doc_id")
    sc.setJobGroup("widen-probe-guard", "no jobs may run at probe time")
    try:
        assert widen_if_narrow(joined) is joined
        assert list(sc.statusTracker().getJobIdsForGroup("widen-probe-guard")) == []
    finally:
        sc.setJobGroup("", "")

    # results are placement-invariant: same rows either way
    monkeypatch.delenv("SPARK_GRAFT_WIDEN", raising=False)
    assert sorted(r.doc_id for r in widen_if_narrow(docs).collect()) == sorted(
        r.doc_id for r in docs.collect()
    )


def test_bucket_pairs_hot_bucket_streams(spark):
    """A degenerate hot bucket — ONE band value shared by 20k docs
    (boilerplate/near-empty texts collapsing to the same simhash band)
    — must STREAM its C(n,2) = 2x10^8 candidate pairs through the
    nested generators. The pre-r12 flatten(transform(...)) pair
    generation materialized all pairs as a single-row struct array
    first — several GB in one row at this size (guide §5) — measured
    killing the whole local JVM with java.lang.OutOfMemoryError after
    ~160 s, while this form counts the identical pair stream in ~4 s
    with O(n) peak row width."""
    from firefly_vcut_spark.operators.dedup import bucket_pairs

    n = 20_000
    buckets = spark.range(1).select(F.sequence(F.lit(1), F.lit(n)).alias("ids"))
    assert bucket_pairs(buckets, "ids").count() == n * (n - 1) // 2
