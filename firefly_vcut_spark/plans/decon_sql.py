"""Benchmark decontamination — the leakage scan every training-data
pipeline runs before a model train: flag corpus documents that share
any 13-gram with a held-out evaluation set (the n-gram overlap
decontamination of GPT-3 appendix C / PaLM / Llama data cards).

Fixture discipline (same as er_sql planted twins): the synthetic
corpus has no real benchmark, so the eval set is a deterministic
doc_id slice and contamination is PLANTED — every 3rd eval doc gets a
train-side twin carrying the eval text behind a pad prefix, under a
shifted id. The detector must re-find exactly those twins (plus any
genuine exact-dup leakage the corpus already contains), and the
DuckDB oracle replays the whole pipeline closed-form.

Relation to ``corpus_decontaminate`` (pipeline_ops.py): that one is
the lightweight 4-gram containment pass over raw gram strings; this
is the r6-verdict-specified heavy variant — 13-gram (the published
decontamination width), PLANTED contaminated twins whose recall is
pinned by test, and a hashed-gram join so no exchange ever carries
text.

Reference scope note: the reference (firefly-vcut) has no
decontamination stage; this belongs to the training-data surface the
brief adds on top (dedup/selection/leakage family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_N = 13  # industry-standard decontamination gram width
_EVAL_MOD, _EVAL_RES = 17, 3  # eval slice: doc_id % 17 == 3
_PLANT_MOD = 51  # every 3rd eval doc (51 = 3*17) gets a planted twin
_ID_SHIFT = 10_000_000
_PAD = "held out benchmark prompt"

_NORM = r"regexp_replace(lower(trim({t})), '\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


def _gram_sql(src: str, idcol: str) -> str:
    """One doc-side of the scan: explode 13-gram positions and emit
    the 16-hex md5 gram key (md5 is bit-identical in both engines, so
    even collisions — ~2^-64 — are shared and the hash join is an
    exact twin of the Spark plan)."""
    return f"""
        SELECT {idcol},
               substr(md5(array_to_string(toks[i:i+{_N - 1}], ' ')), 1, 16)
                 AS gk
        FROM (
            SELECT {idcol}, toks,
                   unnest(range(1, greatest(len(toks) - {_N - 2}, 1))) AS i
            FROM {src}
        )
    """


@query(
    "corpus_decontaminate_vs_eval",
    sql=f"""
    WITH eval_t AS (
        SELECT doc_id AS eval_id, {_TOKS.format(t="text")} AS toks
        FROM documents WHERE doc_id % {_EVAL_MOD} = {_EVAL_RES}
    ),
    train_t AS (
        SELECT doc_id AS train_id, {_TOKS.format(t="text")} AS toks
        FROM documents WHERE doc_id % {_EVAL_MOD} <> {_EVAL_RES}
        UNION ALL
        SELECT doc_id + {_ID_SHIFT} AS train_id,
               {_TOKS.format(t=f"'{_PAD} ' || text")} AS toks
        FROM documents WHERE doc_id % {_PLANT_MOD} = {_EVAL_RES}
    ),
    eg AS (SELECT DISTINCT eval_id, gk FROM ({_gram_sql("eval_t", "eval_id")})),
    tg AS ({_gram_sql("train_t", "train_id")})
    SELECT CAST(t.train_id AS BIGINT) AS train_id,
           CAST(count(DISTINCT t.gk) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
    FROM tg t JOIN eg e ON e.gk = t.gk
    GROUP BY t.train_id
    """,
    tags=("corpus", "dedup", "decontamination", "extension"),
)
def corpus_decontaminate_vs_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13-gram decontamination of the training corpus against a
    held-out eval slice: output one row per CONTAMINATED train doc —
    (train_id, n distinct shared 13-grams, n distinct eval docs hit).
    Planted twins ('{pad} ' || eval_text under shifted ids) must all
    be re-found; clean docs must not appear.

    Scale shape: text never enters a shuffle — each side collapses to
    (id, 16-hex md5 gram key) right after the tokenize+gram explode
    (the token array is BOUND before the n-gram HOF so the split runs
    once per doc, not per gram). The eval gram set is DISTINCT'd and
    BROADCAST: a real benchmark suite is O(fixed) (thousands of docs)
    regardless of corpus size, so the corpus side joins map-side and
    the only exchange is the final train_id rollup. At a true 100 TB
    run with a too-big-to-broadcast eval set, dropping the broadcast
    hint degrades gracefully to a hash join on gk."""
    from firefly_vcut_spark.operators.text import tokens, word_ngrams

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % _EVAL_MOD == _EVAL_RES

    def gram_keys(df: DataFrame, idcol: str) -> DataFrame:
        # bind the token array FIRST: an unbound tokens(...) inside the
        # n-gram lambda re-splits the text per gram (measured O(len²))
        return (
            df.select(idcol, tokens(F.col("text")).alias("tk"))
            .select(idcol, F.explode(word_ngrams(F.col("tk"), _N)).alias("g"))
            .select(idcol, F.substring(F.md5(F.col("g")), 1, 16).alias("gk"))
        )

    eval_docs = d.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "text")
    planted = d.filter(F.col("doc_id") % _PLANT_MOD == _EVAL_RES).select(
        (F.col("doc_id") + _ID_SHIFT).alias("train_id"),
        F.concat(F.lit(_PAD + " "), F.col("text")).alias("text"),
    )
    train = (
        d.filter(~is_eval)
        .select(F.col("doc_id").alias("train_id"), "text")
        .unionByName(planted)
    )
    eg = gram_keys(eval_docs, "eval_id").distinct()
    tg = gram_keys(train, "train_id")
    return (
        tg.join(F.broadcast(eg), "gk")
        .groupBy("train_id")
        .agg(
            F.countDistinct("gk").cast("long").alias("n_shared_grams"),
            F.countDistinct("eval_id").cast("long").alias("n_eval_docs"),
        )
        .select(
            F.col("train_id").cast("long").alias("train_id"),
            "n_shared_grams",
            "n_eval_docs",
        )
    )
