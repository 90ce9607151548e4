"""Naive Bayes language classifier over character bigrams — the
counting-based ML family member: training is pure aggregation
(per-language bigram counts + priors), scoring is integer-quantized
log-prob summation, prediction is an argmax with a deterministic
tiebreak. Train/test split is the deterministic doc_id % 5 holdout.

Everything the model does is replayed by the oracle — counts, add-1
smoothing, the quantized logs (the F.log↔ln parity pattern proven by
text_char_lm_scores), the argmax — so the CLASSIFIER'S confusion
matrix is hash-pinned, not just its row count."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.text import char_bigrams
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


@query(
    "text_nb_langid_confusion",
    sql=f"""
    WITH norm AS (SELECT doc_id, lang, {_NORM} AS t FROM documents),
    bg_all AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2))) AS bg
      FROM norm WHERE length(t) >= 2
    ),
    doc_bg AS (SELECT doc_id, lang, bg, count(*) AS m FROM bg_all GROUP BY 1, 2, 3),
    train_bg AS (
      SELECT lang, bg, CAST(sum(m) AS BIGINT) AS n
      FROM doc_bg WHERE doc_id % 5 <> 0 GROUP BY 1, 2
    ),
    lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM train_bg GROUP BY 1),
    voc AS (SELECT count(DISTINCT bg) AS v FROM train_bg),
    pr AS (
      SELECT lang, count(*) AS nd FROM documents
      WHERE doc_id % 5 <> 0 GROUP BY 1
    ),
    tot AS (SELECT count(*) AS t FROM documents WHERE doc_id % 5 <> 0),
    langs AS (
      SELECT l.lang,
             CAST(round(ln(CAST(p.nd AS DOUBLE) / t.t) * 1000000) AS BIGINT)
               AS qprior,
             CAST(round(ln(1.0 / (l.nl + v.v)) * 1000000) AS BIGINT) AS qlp0,
             l.nl, v.v
      FROM lt l JOIN pr p USING (lang) CROSS JOIN voc v CROSS JOIN tot t
    ),
    scored AS (
      SELECT d.doc_id, d.lang AS true_lang, L.lang AS cand,
             max(L.qprior)
             + sum(d.m * coalesce(
                 CAST(round(ln((tb.n + 1.0) / (L.nl + L.v)) * 1000000)
                      AS BIGINT),
                 L.qlp0)) AS qscore
      FROM doc_bg d
      CROSS JOIN langs L
      LEFT JOIN train_bg tb ON tb.lang = L.lang AND tb.bg = d.bg
      WHERE d.doc_id % 5 = 0
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY qscore DESC, cand ASC) AS rn
        FROM scored) t WHERE rn = 1
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    """,
    tags=("text", "ml", "extension"),
)
def text_nb_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix of an add-1-smoothed character-
    bigram Naive Bayes classifier: trained on the doc_id %% 5 ≠ 0
    slice, evaluated on the holdout, predictions by quantized-integer
    log-prob argmax (ties → lexicographically first language). The
    supervised counterpart of the heuristic `text_lang_id`.

    Scale: training IS aggregation (one explode already shared with
    the other char-gram queries, lang×vocab counts); the model is
    vocab-bounded so every scoring join BROADCASTS; scoring shuffles
    only the compact (doc, bg, m) table. Docs shorter than one bigram
    have no features and are excluded by construction."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "lang", F.explode(char_bigrams(F.col("text"))).alias("bg")
    )
    doc_bg = grams.groupBy("doc_id", "lang", "bg").agg(
        F.count(F.lit(1)).alias("m")
    )
    is_train = F.col("doc_id") % 5 != 0
    train_bg = (
        doc_bg.filter(is_train)
        .groupBy("lang", "bg")
        .agg(F.sum("m").cast("long").alias("n"))
    )
    lt = train_bg.groupBy("lang").agg(F.sum("n").cast("long").alias("nl"))
    v_size = train_bg.select("bg").distinct().count()
    pr = docs.filter(is_train).groupBy("lang").agg(
        F.count(F.lit(1)).alias("nd")
    )
    t_total = docs.filter(is_train).count()
    langs = (
        lt.join(pr, "lang")
        .select(
            "lang",
            F.round(
                F.log(F.col("nd").cast("double") / F.lit(t_total)) * 1e6
            )
            .cast("long")
            .alias("qprior"),
            F.round(
                F.log(F.lit(1.0) / (F.col("nl") + F.lit(v_size))) * 1e6
            )
            .cast("long")
            .alias("qlp0"),
            "nl",
        )
        .withColumn("v", F.lit(v_size))
    )
    cand = langs.select(
        F.col("lang").alias("cand"), "qprior", "qlp0", "nl", "v"
    )
    model = train_bg.select(
        F.col("lang").alias("cand"), "bg", "n"
    )
    qlp = (
        F.round(
            F.log((F.col("n") + F.lit(1.0)) / (F.col("nl") + F.col("v")))
            * 1e6
        )
        .cast("long")
    )
    scored = (
        doc_bg.filter(~is_train)
        .crossJoin(F.broadcast(cand))
        .join(F.broadcast(model), ["cand", "bg"], "left")
        .groupBy(
            "doc_id", F.col("lang").alias("true_lang"), "cand"
        )
        .agg(
            (
                F.max("qprior")
                + F.sum(F.col("m") * F.coalesce(qlp, F.col("qlp0")))
            ).alias("qscore")
        )
    )
    pred = (
        scored.groupBy("doc_id", "true_lang")
        .agg(F.min(F.struct((-F.col("qscore")).alias("neg"), F.col("cand").alias("c"))).alias("best"))
        .select("true_lang", F.col("best.c").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
