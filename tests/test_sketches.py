"""Sketch-family properties beyond the oracle hash: CMS one-sided
error, KMV merge-invariance, and estimator accuracy on a set large
enough for the order-statistic math to bite."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.sketches import (
    cms_point_estimates,
    cms_table,
    kmv_bottom_k,
    kmv_estimate,
)
from firefly_vcut_spark.sources.catalog import load_table


def test_cms_estimates_are_one_sided(spark, sf_dir):
    """Count-Min error is strictly one-sided: estimate >= exact for
    every key (counters only ever add colliding keys' counts)."""
    ev = load_table(spark, sf_dir, "events")
    cms = cms_table(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_point_estimates(exact.select("user_id"), cms, "user_id")
    bad = (
        exact.join(est, "user_id")
        .filter(F.col("cms_estimate") < F.col("exact_n"))
        .count()
    )
    assert bad == 0


def test_cms_total_mass_per_row(spark, sf_dir):
    """Every CMS row's counters sum to the total input count — the
    additive-counter invariant that makes two sketches merge by
    adding tables."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    sums = (
        cms_table(ev, "user_id", depth=4)
        .groupBy("r")
        .agg(F.sum("n").alias("mass"))
        .collect()
    )
    assert len(sums) == 4
    assert all(row["mass"] == total for row in sums)


def test_kmv_merge_invariance(spark, sf_dir):
    """The two-level salted build returns the same sketch as a
    single-partial build: bottom-k of a union == bottom-k of merged
    bottom-k partials."""
    ev = load_table(spark, sf_dir, "events")
    one = {
        r["event_type"]: (r["kmv"], r["n_distinct"])
        for r in kmv_bottom_k(ev, "event_type", "user_id", n_salts=1).collect()
    }
    many = {
        r["event_type"]: (r["kmv"], r["n_distinct"])
        for r in kmv_bottom_k(ev, "event_type", "user_id", n_salts=8).collect()
    }
    assert one == many


def test_kmv_estimate_accuracy_large_set(spark):
    """On 20k distinct ids (>> k) the k=64 order-statistic estimate
    lands within 3 standard errors (~3/sqrt(64) = 37.5%) of truth."""
    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("user_id")
    )
    sk = kmv_bottom_k(df, "g", "user_id", k=64)
    row = sk.select(
        "n_distinct", kmv_estimate(F.col("kmv"), 64).alias("est")
    ).collect()[0]
    assert row["n_distinct"] == n
    assert abs(row["est"] - n) / n < 0.375


def test_kmv_small_set_is_exact(spark):
    """Sets smaller than k are carried exactly: the sketch IS the
    hash set and the estimator returns its size."""
    df = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").alias("user_id")
    )
    sk = kmv_bottom_k(df, "g", "user_id", k=64)
    row = sk.select(
        F.size("kmv").alias("sz"), kmv_estimate(F.col("kmv"), 64).alias("est")
    ).collect()[0]
    assert row["sz"] == 10
    assert row["est"] == 10.0


def test_semdedup_drops_planted_duplicates(spark):
    """semdedup: an exact duplicate pair in the same cluster keeps
    exactly one survivor; vectors with no near-dup all survive."""
    from firefly_vcut_spark.operators.ann import semdedup

    base = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in base],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup(df, n_cells=2, iters=1, tau=0.95).collect()
    }
    assert sorted(out) == [1, 2, 3, 4, 5]
    assert out[1] + out[2] == 1  # exactly one of the dup pair survives
    assert out[3] == out[4] == out[5] == 1


def test_weighted_sample_keys_favor_heavy_items(spark):
    """The min-of-w-hashes key wins for a weight-9 item over a
    weight-1 item ~90% of the time across independent hash seeds
    (exact A-ES probability w/(w_a+w_b) = 0.9)."""
    from firefly_vcut_spark.operators.corpus import weighted_sample_keys

    n_seeds = 60
    exprs = []
    for s in range(n_seeds):
        ka = weighted_sample_keys(F.lit(1001).cast("long"), F.lit(9), seed=s)
        kb = weighted_sample_keys(F.lit(2002).cast("long"), F.lit(1), seed=s)
        exprs.append(F.when(ka < kb, 1).otherwise(0).alias(f"w{s}"))
    row = spark.range(1).select(*exprs).collect()[0]
    wins = sum(row)
    # E=54, sigma~2.3; 42 is >5 sigma below — flags a broken sampler,
    # not an unlucky draw
    assert wins >= 42, wins


def test_cms_join_size_estimate_is_one_sided(spark, sf_dir):
    """The CMS inner-product join-size estimate never underestimates,
    and tightens as the sketch widens."""
    from firefly_vcut_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    exact = li.join(o, "k").count()
    ests = {}
    for w in (256, 4096):
        cl = cms_table(li, "k", 4, w).withColumnRenamed("n", "nl")
        co = cms_table(o, "k", 4, w).withColumnRenamed("n", "no")
        ests[w] = (
            cl.join(co, ["r", "bucket"])
            .groupBy("r")
            .agg(F.sum(F.col("nl") * F.col("no")).alias("ip"))
            .agg(F.min("ip"))
            .collect()[0][0]
        )
    assert all(e >= exact for e in ests.values()), (ests, exact)
    assert ests[4096] <= ests[256]


def test_bitmap_overlap_equals_join_based_overlap(spark, sf_dir):
    """The bitmap AND+popcount intersections equal the user-level
    join-based audience overlap for every type pair."""
    from firefly_vcut_spark.plans import all_queries

    qs = all_queries()
    bm = {
        (r["type_a"], r["type_b"]): r["n_both"]
        for r in qs["agg_bitmap_audience_overlap"].fn(spark, sf_dir).collect()
    }
    jn = {
        (r["type_a"], r["type_b"]): r["n_both"]
        for r in qs["agg_audience_overlap"].fn(spark, sf_dir).collect()
        if r["type_a"] < r["type_b"] and r["n_both"] > 0
    }
    assert bm == jn and bm


def test_weighted_sample_keys_zero_weight_never_wins(spark):
    """Weight <= 0 rows get the MINHASH_P sentinel (>= every real
    residue key), so they lose under Spark's ASC default NULLS FIRST
    too — a caller that forgets to pre-clamp or order NULLs last
    cannot silently select zero-ticket rows."""
    from pyspark.sql import functions as F

    from firefly_vcut_spark.operators.corpus import weighted_sample_keys
    from firefly_vcut_spark.operators.dedup import MINHASH_P

    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 5), (4, 1)], ["id", "w"]
    ).select(
        "id",
        weighted_sample_keys(F.col("id"), F.col("w")).alias("k"),
    )
    rows = {r["id"]: r["k"] for r in df.collect()}
    assert rows[1] == MINHASH_P and rows[2] == MINHASH_P
    assert rows[3] < MINHASH_P and rows[4] < MINHASH_P
    # the ASC-ordered draw can only pick positive-weight rows
    picked = [r["id"] for r in df.orderBy(F.asc("k")).limit(2).collect()]
    assert set(picked) == {3, 4}
