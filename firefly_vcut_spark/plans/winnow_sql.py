"""Winnowing-fingerprint queries: per-doc fingerprint stats and the
shared-fingerprint near-dup pair scan (the MOSS workflow).

Complements the MinHash/SimHash family: winnowing matches on SHARED
SUBSTRINGS (any common run of ≥ k+w-1 chars guarantees a shared
fingerprint), where MinHash matches on set-level Jaccard — the right
tool for detecting partial containment / quotation / plagiarism-style
overlap that whole-document signatures dilute.

The DuckDB oracle replays everything: the alnum normalization, the
per-position polynomial gram hashes, and the rightmost-min window
selection rule (max position among window-min hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.dedup import bucket_pairs
from firefly_vcut_spark.operators.text import _MOD, winnow_fingerprints
from firefly_vcut_spark.operators.skew import widen_if_narrow
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_K, _W = 8, 4
_MAX_DOCS_PER_FP = 50  # stop-gram cap: drop fingerprints this common

# shared SQL prelude: distinct selected (doc_id, pos, h) fingerprints
_FPS_CTE = f"""
norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents
),
dims AS (
  SELECT doc_id, s, greatest(length(s) - {_K - 1}, 0) AS m FROM norm
),
pos AS (
  SELECT doc_id, s, m, unnest(range(1, m + 1)) AS i FROM dims WHERE m >= 1
),
grams AS (
  SELECT doc_id, m, i,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(
               list_filter(string_split(substr(s, CAST(i AS INT), {_K}), ''),
                           c -> c != ''),
               c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % {_MOD}) AS h
  FROM pos
),
winstarts AS (
  SELECT doc_id, unnest(range(1, m - {_W} + 2)) AS ws
  FROM dims WHERE m >= {_W}
),
grid AS MATERIALIZED (
  SELECT g.doc_id, w.ws, g.i, g.h
  FROM grams g JOIN winstarts w
    ON g.doc_id = w.doc_id AND g.i BETWEEN w.ws AND w.ws + {_W - 1}
),
winmin AS (
  SELECT doc_id, ws, min(h) AS mh FROM grid GROUP BY doc_id, ws
),
sel AS (
  SELECT g.doc_id, g.ws, max(g.i) AS pos, min(g.h) AS h
  FROM grid g JOIN winmin m
    ON g.doc_id = m.doc_id AND g.ws = m.ws AND g.h = m.mh
  GROUP BY g.doc_id, g.ws
),
fps AS (
  SELECT DISTINCT doc_id, pos, h FROM sel
)
"""


@query(
    "text_winnow_fingerprints",
    sql=f"""
    WITH {_FPS_CTE}
    SELECT d.doc_id,
           CAST(d.m AS BIGINT) AS n_grams,
           CAST(coalesce(f.n_fps, 0) AS BIGINT) AS n_fps,
           CAST(coalesce(f.fp_sum, 0) AS BIGINT) AS fp_sum,
           CAST(f.fp_min AS BIGINT) AS fp_min,
           CAST(f.fp_max AS BIGINT) AS fp_max
    FROM dims d
    LEFT JOIN (
      SELECT doc_id, count(*) AS n_fps, sum(h) % {_MOD} AS fp_sum,
             min(h) AS fp_min, max(h) AS fp_max
      FROM fps GROUP BY doc_id
    ) f USING (doc_id)
    """,
    tags=("text", "extension", "fingerprint"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc winnowing fingerprint profile: gram count, selected
    fingerprint count (density ≈ 2/(w+1) of grams), and
    order-independent integer digests (sum mod P / min / max) of the
    fingerprint hash set — all replayed exactly by the oracle.

    Scale: pure scan shape — the whole algorithm is array codegen per
    row; no shuffle, no explode, fingerprints never leave the row."""
    docs = load_table(spark, sf_dir, "documents")
    fp = winnow_fingerprints(docs, "text", "doc_id", _K, _W)
    hs = F.transform("fps", lambda x: x["h"])
    return fp.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("long").alias("n_fps"),
        F.aggregate(
            hs, F.lit(0).cast("long"), lambda acc, h: acc + h
        ).__mod__(_MOD).alias("fp_sum"),
        F.array_min(hs).alias("fp_min"),
        F.array_max(hs).alias("fp_max"),
    )


@query(
    "dedup_winnow_pairs",
    sql=f"""
    WITH {_FPS_CTE},
    doc_fp AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM fps),
    common AS (
      SELECT h FROM doc_fp GROUP BY h
      HAVING count(*) BETWEEN 2 AND {_MAX_DOCS_PER_FP}
    ),
    kept AS (SELECT d.doc_id, d.h FROM doc_fp d JOIN common USING (h))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    tags=("dedup", "extension", "fingerprint", "bench"),
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-overlap candidate pairs: docs sharing ≥2 winnowing
    fingerprints, after dropping fingerprints common to more than 50
    docs (the boilerplate/stop-gram cap that keeps bucket fan-out
    bounded — same role as LSH band-size control). Catches quotation /
    partial-containment overlap MinHash's whole-set Jaccard dilutes.

    Scale: fingerprints explode map-side to (h, doc_id) — 8-byte
    hashes, never text; ONE shuffle on h builds the ≤50-doc bucket
    per fingerprint (collect_list is safe: the cap bounds the bucket),
    pairs are generated IN the bucket array (≤ C(50,2) per h, pure
    codegen — no self-join, so the fingerprint pipeline runs once
    instead of once per join side), and one shuffle on the pair
    counts shared fingerprints. The LSH-candidate shape with h as the
    band key."""
    # the winnowing expression is the CPU stage: spread the (often
    # single-file) scan across cores before computing it
    docs = widen_if_narrow(load_table(spark, sf_dir, "documents"))
    fp = winnow_fingerprints(docs, "text", "doc_id", _K, _W)
    doc_fp = fp.select(
        "doc_id", F.explode(F.array_distinct(F.transform("fps", lambda x: x["h"]))).alias("h")
    )
    # one h-keyed aggregation replaces the old count-filter + join-back
    # + bucket self-join (which duplicated the whole fingerprint
    # subtree on both join sides): bucket = sorted doc ids sharing h,
    # capped at the stop-gram bound, pairs exploded from the array
    buckets = (
        doc_fp.groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= _MAX_DOCS_PER_FP))
    )
    return (
        bucket_pairs(buckets, "ids")
        .groupBy(F.col("_a").alias("id_a"), F.col("_b").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


_CW, _CS = 64, 48  # chunk window / stride (16-token overlap)


@query(
    "corpus_passage_chunks",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
               t -> t != '') AS tk
      FROM documents
    ),
    dims AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) >= 1),
    chunks AS (
      SELECT doc_id, n,
             unnest(range(0, 1 + (greatest(n - {_CW}, 0) + {_CS} - 1) // {_CS})) AS ci
      FROM dims
    ),
    sliced AS (
      SELECT c.doc_id, c.ci,
             list_slice(d.tk, c.ci * {_CS} + 1,
                        least(c.ci * {_CS} + {_CW}, d.n)) AS ck
      FROM chunks c JOIN dims d USING (doc_id)
    )
    SELECT doc_id,
           CAST(ci AS BIGINT) AS chunk_idx,
           CAST(len(ck) AS BIGINT) AS n_tokens,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(ck, t ->
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(list_filter(string_split(t, ''),
                                                 ch -> ch != ''),
                        ch -> CAST(ascii(ch) AS BIGINT))),
                      (a, ch) -> (a * 31 + ch) % {_MOD}))),
                  (acc, th) -> (acc * 131 + th) % {_MOD}) AS BIGINT)
             AS chunk_checksum
    FROM sliced
    """,
    tags=("corpus", "extension", "chunking"),
)
def corpus_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping passage chunking (the RAG / embedding-prep shape):
    each doc's whitespace tokens windowed into 64-token passages at
    stride 48 (16-token overlap so no boundary-split context is
    lost). Output carries an order-sensitive integer checksum of each
    passage's tokens instead of the text, so the oracle hash pins the
    exact chunk CONTENT, not just counts.

    Scale: pure map-side — tokens split once, chunk indices explode
    O(n/stride) per doc, the slice+fold rides codegen; no shuffle at
    all (plan shape like the winnow stats)."""
    from firefly_vcut_spark.operators.dedup import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(
        F.split(normalized_text(F.col("text")), " "), lambda t: t != ""
    )
    base = docs.select("doc_id", tk.alias("tk")).withColumn(
        "n", F.size("tk")
    ).filter(F.col("n") >= 1)
    # chunk count = 1 + ceil(max(n - W, 0) / S): no chunk is fully
    # contained in its predecessor; interiors are window-sized and the
    # tail still ends at token n
    ci = F.explode(
        F.sequence(
            F.lit(0),
            F.expr(
                f"CAST((greatest(n - {_CW}, 0) + {_CS} - 1) div {_CS} AS INT)"
            ),
        )
    )
    sliced = base.select("doc_id", "tk", "n", ci.alias("ci")).select(
        "doc_id",
        "ci",
        F.slice(
            "tk",
            F.col("ci") * _CS + 1,
            F.least(F.lit(_CW), F.col("n") - F.col("ci") * _CS),
        ).alias("ck"),
    )
    tok_hash = lambda t: F.aggregate(
        F.filter(F.split(t, ""), lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda a, c: (a * 31 + F.ascii(c)) % _MOD,
    )
    checksum = F.aggregate(
        F.transform("ck", tok_hash),
        F.lit(0).cast("long"),
        lambda acc, th: (acc * 131 + th) % _MOD,
    )
    return sliced.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_idx"),
        F.size("ck").cast("long").alias("n_tokens"),
        checksum.alias("chunk_checksum"),
    )
