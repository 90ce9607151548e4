"""RAG context assembly: the retrieval-augmented-generation serving
shape — per-query ANN retrieval joined back to document text, packed
into a token budget in rank order, and fingerprinted. Composes the
ANN ladder (operators/ann.py) with the documents table end-to-end;
the oracle replays retrieval, packing, and the context digest, so the
assembled context BYTES are verified, not just counts.

Reference scope note: the reference's search CLI (`search --bvid
--text`) retrieves one document by fuzzy scan; embedding retrieval +
context packing is this repo's LLM-pipeline extension of that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_K = 3  # retrieved docs per query
_BUDGET = 256  # context token budget
_SEP = "|~|"
_NORM_D = r"regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')"


@query(
    "rag_context_assembly",
    sql=f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (
        SELECT vec_id AS neighbor_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings
    ),
    scored AS (
        SELECT q.query_id, c.neighbor_id,
               round(list_cosine_similarity(q.qv, c.cv), 4) AS cos_sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM scored
    ),
    ctx AS (
        SELECT r.query_id, r.rank, d.text,
               len(string_split({_NORM_D}, ' ')) AS nt
        FROM ranked r JOIN documents d ON d.doc_id = r.neighbor_id
        WHERE r.rank <= {_K}
    ),
    packed AS (
        SELECT *, sum(nt) OVER (PARTITION BY query_id ORDER BY rank
                     ROWS UNBOUNDED PRECEDING) AS cum
        FROM ctx
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_ctx_docs,
           CAST(max(cum) AS BIGINT) AS ctx_tokens,
           md5(string_agg(text, '{_SEP}' ORDER BY rank)) AS ctx_digest
    FROM packed WHERE cum <= {_BUDGET}
    GROUP BY query_id
    """,
    tags=("ann", "rag", "extension", "vector", "join"),
)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query RAG context: exact cosine top-3 retrieval
    (broadcast query set — the serving path would swap in the IVF/PQ
    ladder behind the same interface), neighbors joined to their text,
    packed greedily in rank order under a 256-whitespace-token budget,
    and the assembled context md5-fingerprinted in pack order — one
    flipped byte or swapped rank anywhere breaks the digest.

    Scale: retrieval is the proven brute-force shape (query set
    broadcasts, one query-keyed exchange); the text join is id-keyed;
    packing is a per-query window over ≤ k rows."""
    from firefly_vcut_spark.operators.ann import brute_force_topk
    from firefly_vcut_spark.operators.text import token_count

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("neighbor_id"),
        "text",
        token_count(F.col("text")).alias("nt"),
    )
    top = brute_force_topk(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=_K
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        top.join(docs, "neighbor_id")
        .withColumn("cum", F.sum("nt").over(w))
        .filter(F.col("cum") <= _BUDGET)
    )
    ordered_texts = F.transform(
        F.array_sort(F.collect_list(F.struct("rank", "text"))),
        lambda s: s["text"],
    )
    return packed.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ctx_docs"),
        F.max("cum").cast("long").alias("ctx_tokens"),
        F.md5(F.array_join(ordered_texts, _SEP)).alias("ctx_digest"),
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        "n_ctx_docs",
        "ctx_tokens",
        "ctx_digest",
    )
