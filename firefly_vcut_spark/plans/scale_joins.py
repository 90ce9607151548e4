"""Scale-pattern joins: Bloom semi-join reduction and salted skew
joins, as oracle-checked registry queries.

Both patterns change the PHYSICAL shape of a big join without changing
its result, so each query's DuckDB oracle is simply the plain join —
the strongest possible statement that the optimization is semantics-
free. Plan-quality gates (tests/test_plans.py) assert the shape that
makes them worth running at 100 TB: the Bloom bitmap broadcasts as one
row and prunes the fact before its shuffle; the salted join shuffles
on (key, salt) with no broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.bloom import bloom_prefilter, build_bloom
from firefly_vcut_spark.operators.skew import salted_join
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

BLOOM_M_BITS = 1 << 13
BLOOM_K = 3


@query(
    "j_bloom_prefilter",
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)      AS n_orders,
           ROUND(sum(o_totalprice), 4)   AS sum_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9000
    GROUP BY o_orderstatus
    """,
    tags=("join", "scale", "extension"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (operators/bloom.py): rich customers
    (c_acctbal > 9000, ~10% of the dim) aggregate into a 1 KB Bloom
    bitmap; the orders fact is pruned against it scan-side — before
    any shuffle — and the exact inner join that follows removes the
    false positives, so the oracle is the PLAIN join. At 100 TB this
    is the difference between shuffling the whole fact and shuffling
    ~the matching tenth; Spark's AQE runtime bloomFilter rewrite is
    the adaptive twin of this explicit plan."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    bloom = build_bloom(dim, "c_custkey", BLOOM_M_BITS, BLOOM_K)
    fact = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    candidates = bloom_prefilter(fact, "o_custkey", bloom, BLOOM_M_BITS, BLOOM_K)
    return (
        candidates.join(F.broadcast(dim), candidates.o_custkey == dim.c_custkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
    )


@query(
    "j_salted_skew",
    sql="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value), 4)     AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "scale", "extension"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py): events concentrate on 150
    hot user ids out of customer's 1500-key domain — exactly the
    power-law shape that makes one reducer the straggler at 100 TB.
    The fact takes salt = pmod(xxhash64(event_id), 8), the customer
    dim replicates x8, and the join shuffles on (key, salt) under a
    shuffle_hash hint (no broadcast), spreading each hot key over 8
    tasks. The oracle is the plain join: salting is semantics-free.
    Rollup to per-nation event counts keeps the output bounded."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(events, customer, "user_id", "event_id", n_salts=8)
    return (
        joined.join(
            F.broadcast(nation), joined.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
