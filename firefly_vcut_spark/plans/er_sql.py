"""Entity resolution / record linkage: blocking + edit-distance
verify (the Fellegi-Sunter blocking architecture every production
linkage system uses — candidate generation by cheap equi-join on a
blocking key, expensive pairwise similarity only on candidates).

Reference scope note: the reference (firefly-vcut) matches lyric lines
fuzzily inside one document (fuzz.py:3-43, the W1 flagship here);
cross-record linkage is part of this repo's training-data surface
(dedup of near-identical entities across sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_MAX_DIST = 2

# Deterministic corruption both engines can replay: drop the 10th
# character (inside the digit zone of 'Customer#000000001'), keeping
# the right-4 blocking key intact — the planted twin lands in the
# SAME block as its original, so the detector provably fires.
_CORRUPT = "substr(c_name, 1, 9) || substr(c_name, 11)"


@query(
    "er_blocked_name_match",
    sql=f"""
    WITH corpus AS (
        SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name FROM customer
        UNION ALL
        SELECT CAST(c_custkey + 1000000 AS BIGINT) AS id,
               {_CORRUPT} AS name
        FROM customer WHERE c_custkey % 13 = 0
    ),
    blocked AS (
        SELECT id, name, substr(name, length(name) - 3, 4) AS blk
        FROM corpus
    ),
    cand AS (
        SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.id < b.id
    )
    SELECT id_a, id_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= {_MAX_DIST}
    """,
    tags=("er", "dedup", "extension", "join"),
)
def er_blocked_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on customer names: planted fuzzy twins
    (char-dropped copies of every 13th name under shifted ids) must be
    re-linked. Candidates come from an EQUI-join on a right-4-chars
    blocking key — never a cartesian — and only candidates pay the
    O(len²) edit-distance verify (JVM levenshtein, codegen).

    Scale: the blocking key spreads uniformly (low key digits), so
    block sizes are O(n / 10^4) and the candidate join is shuffle-
    balanced; the verify is a scan over candidates. This is the same
    block→verify shape as dedup_lsh_then_verify, keyed by a domain
    blocking rule instead of LSH bands."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_name").alias("name"),
    )
    planted = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select(
            (F.col("c_custkey") + 1000000).cast("long").alias("id"),
            F.expr(_CORRUPT).alias("name"),
        )
    )
    corpus = cust.unionByName(planted)
    blocked = corpus.withColumn(
        "blk", F.substring(F.col("name"), F.length("name") - 3, 4)
    )
    a = blocked.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "blk"
    )
    b = blocked.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "blk"
    )
    cand = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist <= _MAX_DIST).select(
        "id_a", "id_b", dist.cast("long").alias("dist")
    )
