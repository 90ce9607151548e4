"""SemDeDup registered query: semantic deduplication of the embedding
corpus (Abbas et al. 2023) — cluster with the shared deterministic
quantizer, then drop intra-cluster semantic near-duplicates under the
keep-least-redundant priority rule. The oracle replays the ENTIRE
chain: the Lloyd fit (shared lloyd_assign_cte), centroid cosines, the
priority comparison, and the per-cell rollup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.ann import semdedup
from firefly_vcut_spark.plans.extensions import lloyd_assign_cte
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_N_CELLS, _ITERS, _TAU = 16, 3, 0.30


def _semdedup_sql() -> str:
    cte, prev = lloyd_assign_cte(_N_CELLS, _ITERS)
    return f"""
    WITH {cte},
    acents AS (
      SELECT a.vec_id, a.v, a.cell,
             round(list_cosine_similarity(a.v, ct.c), 4) AS cent_cos
      FROM assign a JOIN {prev} ct ON ct.cell = a.cell
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM acents a JOIN acents b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
       AND (a.cent_cos < b.cent_cos
            OR (a.cent_cos = b.cent_cos AND a.vec_id < b.vec_id))
       AND round(list_cosine_similarity(a.v, b.v), 4) >= {_TAU}
    )
    SELECT CAST(x.cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN x.vec_id ELSE 0 END)
                AS BIGINT) AS kept_id_sum
    FROM acents x LEFT JOIN dropped d ON d.vec_id = x.vec_id
    GROUP BY x.cell
    """


@query(
    "corpus_semdedup",
    sql=_semdedup_sql(),
    tags=("corpus", "dedup", "extension", "vector", "ml", "bench"),
)
def corpus_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup per-cell summary: members, survivors after dropping
    every vector with a higher-priority semantic near-dup (rounded
    cosine ≥ 0.30 — fixture-tuned like dedup_embedding_cosine) in its
    cluster, and a survivor-id checksum. Priority = (cosine to own
    centroid ASC, id ASC): the paper's keep-the-least-redundant rule
    as a deterministic total order.

    Scale: the cluster assignment IS the blocking key — global O(n²)
    cosine becomes Σ O(|cell|²) with centroids as plan literals; one
    shuffle on cell for the pair join, one for the rollup."""
    e = load_table(spark, sf_dir, "embeddings")
    flags = semdedup(e, _N_CELLS, _ITERS, _TAU)
    return (
        flags.groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(F.col("vec_id") * F.col("keep"))
            .cast("long")
            .alias("kept_id_sum"),
        )
    )
