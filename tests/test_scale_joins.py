"""Bloom semi-join reduction + salted skew join: exactness properties
and the physical-plan shapes that make them scale patterns."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.bloom import bloom_prefilter, build_bloom
from firefly_vcut_spark.operators.skew import salted_join

M_BITS = 1 << 13
K = 3


def test_bloom_no_false_negatives(spark):
    keys = spark.range(100).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", M_BITS, K)
    fact = spark.range(200).withColumnRenamed("id", "k")
    kept = {r["k"] for r in bloom_prefilter(fact, "k", bloom, M_BITS, K).collect()}
    assert set(range(100)) <= kept, "bloom dropped a true member"


def test_bloom_false_positive_rate_bounded(spark):
    keys = spark.range(100).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", M_BITS, K)
    # 10k keys disjoint from the build side
    probe = spark.range(100, 10100).withColumnRenamed("id", "k")
    n_fp = bloom_prefilter(probe, "k", bloom, M_BITS, K).count()
    # theoretical fp ~ (1 - e^(-k*n/m))^k ~= 5e-5 here; 1% is generous
    assert n_fp < 100, f"false-positive rate too high: {n_fp}/10000"


def test_bloom_bitmap_is_one_dense_row(spark):
    keys = spark.range(50).withColumnRenamed("id", "k")
    rows = build_bloom(keys, "k", M_BITS, K).collect()
    assert len(rows) == 1
    words = rows[0]["bloom_words"]
    assert len(words) == M_BITS // 64
    assert any(w != 0 for w in words)


def test_salted_join_equals_plain_join_under_skew(spark):
    # 90% of fact rows on one hot key — the straggler shape
    fact = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    salted = salted_join(fact, dim, "k", "row_id", n_salts=8)
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count()
    a = {(r["row_id"], r["payload"]) for r in salted.collect()}
    b = {(r["row_id"], r["payload"]) for r in plain.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched_once(spark):
    fact = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 99)], ["row_id", "k"]
    )  # k=99 unmatched
    dim = spark.createDataFrame([(7, "x")], ["k", "payload"])
    out = salted_join(fact, dim, "k", "row_id", n_salts=4, how="left").collect()
    assert len(out) == 3
    unmatched = [r for r in out if r["k"] == 99]
    assert len(unmatched) == 1 and unmatched[0]["payload"] is None


def test_bloom_plan_prunes_before_shuffle(spark, sf_dir):
    from firefly_vcut_spark.plans import all_queries

    df = all_queries()["j_bloom_prefilter"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 1-row bitmap fans out via broadcast nested-loop (free), and the
    # exact join broadcasts the small dim; nothing sort-merges
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_plan_shuffles_on_key_and_salt(spark, sf_dir):
    from firefly_vcut_spark.plans import all_queries

    df = all_queries()["j_salted_skew"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the salted join must be a shuffled join over (key, salt) — a
    # broadcast would silently defeat the skew spreading
    assert "ShuffledHashJoin" in plan
    assert "_salt" in plan
