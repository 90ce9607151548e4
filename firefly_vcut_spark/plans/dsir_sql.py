"""DSIR data selection: hashed-ngram importance resampling (Xie et
al., NeurIPS'23) as a registry query with a full DuckDB oracle — the
model fit, the per-doc weights, and the deterministic top-k draw are
all replayed in SQL.

Reference scope note: the reference pipeline (firefly-vcut) selects
work by SQL predicates only; importance-weighted selection is part of
this repo's LLM-training-data surface (brief §"beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.dedup import MINHASH_P
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_B = 64  # hashed feature buckets (paper uses 10k; small keeps the oracle legible)
_K = 100  # selected docs

# DuckDB mirrors of the Spark-side tokenization/hash conventions
# (plans/extensions.py::_NORM/_TOKS, operators/dedup.charfold_hash)
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"
_CHARFOLD_G = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_filter(string_split(g, ''), c -> c != ''), "
    f"c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) % {MINHASH_P})"
)


@query(
    "corpus_dsir_select",
    sql=f"""
    WITH toked AS (
        SELECT doc_id, lang, {_TOKS} AS tk FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
               unnest(tk || list_transform(range(1, len(tk)),
                                           i -> tk[i] || ' ' || tk[i + 1])) AS g
        FROM toked
    ),
    bucketed AS (
        SELECT doc_id, lang, {_CHARFOLD_G} % {_B} AS hb FROM grams
    ),
    model AS (
        SELECT hb, count(*) AS r,
               count(*) FILTER (WHERE lang = 'en') AS t
        FROM bucketed GROUP BY hb
    ),
    tot AS (
        SELECT CAST(sum(r) AS BIGINT) AS tr, CAST(sum(t) AS BIGINT) AS tt
        FROM model
    ),
    lam AS (
        SELECT hb,
               CAST(round(ln(((t + 1.0) / (tt + {_B}))
                             * ((tr + {_B}.0) / (r + 1.0))) * 1000000)
                    AS BIGINT) AS lam
        FROM model CROSS JOIN tot
    ),
    scored AS (
        SELECT doc_id, count(*) AS n_grams, sum(lam) AS w
        FROM bucketed JOIN lam USING (hb) GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(w AS BIGINT) AS w_micro,
           round(w / (1000000.0 * n_grams), 6) AS avg_logratio
    FROM scored
    ORDER BY avg_logratio DESC, doc_id ASC
    LIMIT {_K}
    """,
    tags=("corpus", "extension", "selection", "dsir", "bench"),
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: importance weights from hashed uni+bigram
    models (target = lang='en' slice vs raw corpus), deterministic
    top-100 draw by length-normalized weight. The oracle refits the
    model and replays every hash and quantized log-ratio, so the
    SELECTOR — not just its row count — is verified.

    Scale: two scan-shaped explodes, one 64-row model aggregate
    broadcast back, one doc-keyed aggregation, one TakeOrdered. No
    join ever carries text; the model table is O(64 buckets) whatever
    the corpus size."""
    from firefly_vcut_spark.operators.text import dsir_importance_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_importance_scores(docs, F.col("lang") == "en", n_buckets=_B)
    return (
        scored.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("w_micro").cast("long").alias("w_micro"),
            F.round(
                F.col("w_micro") / (F.lit(1000000.0) * F.col("n_grams")), 6
            ).alias("avg_logratio"),
        )
        .orderBy(F.desc("avg_logratio"), F.asc("doc_id"))
        .limit(_K)
    )
