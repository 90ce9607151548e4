"""Affinity & search-index family: invariants beyond the oracle —
pair-explosion completeness, prefix-filter losslessness vs brute
force, postings discipline, unpivot shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.plans import all_queries
from firefly_vcut_spark.sources.catalog import load_table

QUERIES = all_queries()


def test_cooccurrence_pairs_match_self_join(spark, sf_dir):
    """The map-side basket pair explosion must produce exactly the
    distinct (a<b, same order) pair multiset a self-join would."""
    out = QUERIES["agg_item_cooccurrence"].fn(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    oi = li.distinct()
    a = oi.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = oi.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    sj = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("item_a"), F.col("pb").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 3)
    )
    got = {(r.item_a, r.item_b, r.co_orders) for r in out.collect()}
    want = {(r.item_a, r.item_b, r.co) for r in sj.collect()}
    assert got == want and len(got) > 0


def test_cooccurrence_cosine_bounds(spark, sf_dir):
    rows = QUERIES["agg_item_cooccurrence"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.cosine <= 1.0
        assert r.item_a < r.item_b


def test_inverted_index_postings_discipline(spark, sf_dir):
    rows = QUERIES["text_inverted_index"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids) and len(ids) == len(set(ids))
        assert len(ids) <= 16
        assert r.df >= 5
        assert r.cf >= r.df  # every posting implies >= 1 occurrence


def test_allpairs_prefix_filter_is_lossless(spark, sf_dir):
    """THE AllPairs guarantee: prefix-filtered output == brute-force
    exact-Jaccard join (no candidate the filter could have missed)."""
    from firefly_vcut_spark.operators.dedup import word_shingles
    from firefly_vcut_spark.plans.affinity_sql import ALLPAIRS_TAU

    out = QUERIES["dedup_allpairs_prefix"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sets = docs.select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text")).alias("shs")
    )
    a = sets.select(F.col("id").alias("id_a"), F.col("shs").alias("sa"))
    b = sets.select(F.col("id").alias("id_b"), F.col("shs").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("ix", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jac", F.col("ix") / (F.size("sa") + F.size("sb") - F.col("ix"))
        )
        .filter(F.col("jac") >= ALLPAIRS_TAU)
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got == want and len(got) > 0


def test_unpivot_counts_per_flag(spark, sf_dir):
    out = QUERIES["agg_unpivot_lineitem_metrics"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = {r.l_returnflag: r.n for r in
                li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    metrics = {}
    for r in out:
        assert r.n == per_flag[r.l_returnflag]
        metrics.setdefault(r.l_returnflag, set()).add(r.metric)
    for flag, ms in metrics.items():
        assert ms == {"quantity", "extendedprice", "discount"}


def test_ppjoin_positional_filter_prunes_and_is_lossless(spark, sf_dir):
    """PPJoin positional candidates must be a subset of the plain
    prefix candidates, still cover every true pair, and actually
    prune (the whole point of carrying the ranks)."""
    from firefly_vcut_spark.operators.dedup import word_shingles
    from firefly_vcut_spark.plans.affinity_sql import (
        ALLPAIRS_TAU,
        allpairs_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text")).alias("shs")
    )
    plain = {
        (r.id_a, r.id_b)
        for r in allpairs_candidates(shingled, ALLPAIRS_TAU, positional=False).collect()
    }
    pos = {
        (r.id_a, r.id_b)
        for r in allpairs_candidates(shingled, ALLPAIRS_TAU, positional=True).collect()
    }
    truth = {
        (r.id_a, r.id_b)
        for r in QUERIES["dedup_allpairs_prefix"].fn(spark, sf_dir).collect()
    }
    assert pos <= plain
    assert truth <= pos
    assert len(pos) < len(plain)


def test_allpairs_shingle_scan_is_widened(spark, sf_dir, monkeypatch):
    """r12: allpairs_verified_pairs runs its shingle derivation (the
    family's most expensive per-row stage, measured 75 s/pass at sf1
    on a 1-split scan) behind widen_if_narrow. On a local master the
    plan must carry the round-robin pin (narrow single-file SFs would
    otherwise serialize the stage); in auto mode with an already-wide
    input the pipeline must add NO round-robin exchange (the 100 TB
    path) while producing the identical pair set."""
    from firefly_vcut_spark.plans.affinity_sql import allpairs_verified_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    monkeypatch.delenv("SPARK_GRAFT_WIDEN", raising=False)
    local = allpairs_verified_pairs(docs)
    assert "RoundRobinPartitioning" in local._jdf.queryExecution().toString()

    monkeypatch.setenv("SPARK_GRAFT_WIDEN", "auto")
    wide = allpairs_verified_pairs(
        docs.repartition(spark.sparkContext.defaultParallelism + 3)
    )
    # the pre-widened repartition above is the only round-robin allowed
    plan = wide._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ROUND_ROBIN") <= plan.count("Repartition")

    a = sorted(map(tuple, local.select("id_a", "id_b", "ix").collect()))
    b = sorted(map(tuple, wide.select("id_a", "id_b", "ix").collect()))
    assert a == b
