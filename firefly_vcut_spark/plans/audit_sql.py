"""Pipeline-health audit card (r7 verdict item 5): ONE query that runs
the documents corpus through the production prep chain —
eval-holdout → exact-dedup → decontaminate → quality-filter → pack —
and emits the stage-by-stage row/char/token ledger ("data audit card")
every production training-data pipeline publishes before a run.

Chained-ledger discipline (the reason this is a single plan, not six):
every stage is a CUMULATIVE boolean over one shared per-doc
featurization (fingerprint, token stats, contamination flag), so the
ledger is ONE aggregation pass over one flags subtree — no stage
rematerializes another's input, and the whole card is a single job.
A naive chain of six materialized counts would rescan the corpus six
times; at 100 TB that's the difference between one pass and a day.

Stage semantics (each reuses the engine's existing, oracle-proven
component recipe):
- eval_holdout: doc_id % 41 == 0 stands in for the held-out eval
  suite (same convention as ``corpus_decontaminate``);
- exact_dedup: md5-of-normalized-text fingerprint, first-id-wins
  (``operators/dedup.exact_dedup`` recipe), ranked among non-eval
  docs only so eval docs can't claim canonical slots;
- decontaminate: drop training docs sharing any word 4-gram with the
  eval set (``operators/corpus.decontaminate`` — bench grams
  broadcast, corpus text never shuffles);
- quality_filter: the C4-style first-failing-rule chain of
  ``corpus_quality_filter_chain`` (length floor, token-length band,
  stopword floor);
- pack: concat-and-chunk at 256 tokens per source (the GPT-style
  packing a 100 TB pipeline actually ships — ceil(tokens/256) is
  exact SQL, so unlike next-fit the oracle stays linear at any SF).

Reference analog: the reference pipeline has no corpus-prep surface;
this extends the LLM-data axis (SURVEY §2 extensions) with the
cross-stage measurement query, composing components that are each
individually oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.operators import corpus as cp
from firefly_vcut_spark.operators import text as tx
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

# DuckDB mirrors shared with pipeline_ops.py (same normalization /
# tokenization the quality-chain and decontaminate oracles use)
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

_SEQ_LEN = 256
_STAGES = ["ingest", "eval_holdout", "exact_dedup", "decontaminate", "quality_filter"]

_AUDIT_SQL = f"""
WITH feat AS (
  SELECT doc_id, source, n_chars,
         md5({_NORM}) AS fp,
         {_TOKS} AS t,
         (doc_id % 41 = 0) AS is_eval
  FROM documents
),
feat2 AS (
  SELECT doc_id, source, n_chars, fp, is_eval,
         len(t) AS n,
         CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum')
              AS DOUBLE) / greatest(len(t), 1) AS mt,
         CAST(len(list_filter(t,
              x -> list_contains(['the','a','of','and','to','in','is'], x)))
              AS DOUBLE) / greatest(len(t), 1) AS sw,
         list_aggregate(list_transform(t,
              x -> CAST(ceil(length(x) / 4.0) AS BIGINT)), 'sum') AS n_tokens,
         CASE WHEN len(t) >= 4
              THEN [array_to_string(t[i:i+3], ' ')
                    for i in range(1, len(t) - 2)]
              ELSE []::VARCHAR[] END AS gs
  FROM feat
),
rk AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY fp, is_eval ORDER BY doc_id) AS rn
  FROM feat2
),
bench_grams AS (
  SELECT DISTINCT unnest(gs) AS gram FROM feat2 WHERE is_eval
),
contam AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(gs) AS gram FROM feat2 WHERE NOT is_eval) g
  JOIN bench_grams USING (gram)
),
fl AS (
  SELECT f.source, f.n_chars, f.n_tokens,
         f.is_eval,
         (r.rn > 1) AS is_dup,
         (c.doc_id IS NOT NULL) AS contaminated,
         (f.n >= 30 AND f.mt >= 3.0 AND f.mt <= 8.0 AND f.sw >= 0.02) AS qkeep
  FROM feat2 f
  JOIN rk r USING (doc_id)
  LEFT JOIN contam c ON c.doc_id = f.doc_id
),
per_src AS (
  SELECT source,
    count(*) AS n0, COALESCE(sum(n_chars), 0) AS c0,
    COALESCE(sum(n_tokens), 0) AS t0,
    COALESCE(sum(CASE WHEN NOT is_eval THEN 1 END), 0) AS n1,
    COALESCE(sum(CASE WHEN NOT is_eval THEN n_chars END), 0) AS c1,
    COALESCE(sum(CASE WHEN NOT is_eval THEN n_tokens END), 0) AS t1,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup THEN 1 END), 0) AS n2,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup THEN n_chars END), 0) AS c2,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup THEN n_tokens END), 0) AS t2,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup
                       AND NOT contaminated THEN 1 END), 0) AS n3,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup
                       AND NOT contaminated THEN n_chars END), 0) AS c3,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup
                       AND NOT contaminated THEN n_tokens END), 0) AS t3,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup
                       AND NOT contaminated AND qkeep THEN 1 END), 0) AS n4,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup
                       AND NOT contaminated AND qkeep THEN n_chars END), 0) AS c4,
    COALESCE(sum(CASE WHEN NOT is_eval AND NOT is_dup
                       AND NOT contaminated AND qkeep THEN n_tokens END), 0) AS t4
  FROM fl GROUP BY source
),
tot AS (
  SELECT sum(n0) AS n0, sum(c0) AS c0, sum(t0) AS t0,
         sum(n1) AS n1, sum(c1) AS c1, sum(t1) AS t1,
         sum(n2) AS n2, sum(c2) AS c2, sum(t2) AS t2,
         sum(n3) AS n3, sum(c3) AS c3, sum(t3) AS t3,
         sum(n4) AS n4, sum(c4) AS c4, sum(t4) AS t4,
         sum(CAST(ceil(t4 / {_SEQ_LEN}.0) AS BIGINT)) AS n_bins
  FROM per_src
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(rows_dropped AS BIGINT) AS rows_dropped
FROM (
  SELECT 0 AS stage_idx, 'ingest' AS stage, n0 AS n_rows,
         c0 AS n_chars, t0 AS n_tokens, 0 AS rows_dropped FROM tot
  UNION ALL
  SELECT 1, 'eval_holdout', n1, c1, t1, n0 - n1 FROM tot
  UNION ALL
  SELECT 2, 'exact_dedup', n2, c2, t2, n1 - n2 FROM tot
  UNION ALL
  SELECT 3, 'decontaminate', n3, c3, t3, n2 - n3 FROM tot
  UNION ALL
  SELECT 4, 'quality_filter', n4, c4, t4, n3 - n4 FROM tot
  UNION ALL
  SELECT 5, 'pack', n_bins, c4, t4, 0 FROM tot
)
"""


@query(
    "corpus_pipeline_audit_card",
    sql=_AUDIT_SQL,
    tags=("corpus", "extension", "audit"),
)
def corpus_pipeline_audit_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage prep ledger: (stage_idx, stage, n_rows, n_chars,
    n_tokens, rows_dropped) for ingest → eval_holdout → exact_dedup →
    decontaminate → quality_filter → pack. One featurization scan +
    one gram-join flag, one aggregation pass; the six ledger rows
    inline() out of a single total row, so nothing recomputes
    (plan-gated in tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    is_eval = (F.col("doc_id") % 41 == 0).alias("is_eval")
    n = tx.token_count(text)
    mt = tx.mean_token_len(text)
    sw = tx.stopword_ratio(text)
    feat = d.select(
        "doc_id",
        "source",
        "n_chars",
        tx.fingerprint_md5(text).alias("fp"),
        tx.subword_count(text).alias("n_tokens"),
        ((n >= 30) & (mt >= 3.0) & (mt <= 8.0) & (sw >= 0.02)).alias("qkeep"),
        is_eval,
    )
    # first-id-wins rank among non-eval docs (eval docs rank in their
    # own partition and never consume a canonical slot)
    w = Window.partitionBy("fp", "is_eval").orderBy("doc_id")
    ranked = feat.withColumn("is_dup", F.row_number().over(w) > 1)
    # contamination flag: shared-4-gram LEFT-SEMI against the broadcast
    # eval gram set (operators/corpus.contaminated_ids — text never
    # shuffles; the flag variant skips decontaminate's gram-distinct
    # shuffle and per-doc counting since the ledger only drops)
    contam = cp.contaminated_ids(
        d.filter(F.col("doc_id") % 41 != 0),
        d.filter(F.col("doc_id") % 41 == 0),
        n=4,
    ).select(F.col("id").alias("doc_id"), F.lit(True).alias("contaminated"))
    # contaminated ids are a bounded flag set (docs overlapping the
    # eval suite — MBs of longs even at corpus scale): broadcast, so
    # the featurized corpus never shuffles for the flag join
    fl = ranked.join(F.broadcast(contam), "doc_id", "left").select(
        "source",
        "n_chars",
        "n_tokens",
        "is_eval",
        "is_dup",
        F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
        "qkeep",
    )

    s1 = ~F.col("is_eval")
    s2 = s1 & ~F.col("is_dup")
    s3 = s2 & ~F.col("contaminated")
    s4 = s3 & F.col("qkeep")
    conds = [F.lit(True), s1, s2, s3, s4]

    def stage_aggs() -> list:
        aggs = []
        for i, c in enumerate(conds):
            aggs += [
                F.coalesce(F.sum(F.when(c, 1)), F.lit(0)).alias(f"n{i}"),
                F.coalesce(F.sum(F.when(c, F.col("n_chars"))), F.lit(0)).alias(f"c{i}"),
                F.coalesce(F.sum(F.when(c, F.col("n_tokens"))), F.lit(0)).alias(f"t{i}"),
            ]
        return aggs

    # per-source partials (pack chunks per source), then the 1-row total
    per_src = fl.groupBy("source").agg(*stage_aggs())
    tot_aggs = [
        F.sum(f"{p}{i}").alias(f"{p}{i}") for i in range(5) for p in ("n", "c", "t")
    ]
    tot_aggs.append(
        F.sum(F.ceil(F.col("t4") / float(_SEQ_LEN)).cast("long")).alias("n_bins")
    )
    tot = per_src.agg(*tot_aggs)

    rows = []
    for i, name in enumerate(_STAGES):
        dropped = F.lit(0).cast("long") if i == 0 else (
            F.col(f"n{i - 1}") - F.col(f"n{i}")
        ).cast("long")
        rows.append(
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"n{i}").cast("long").alias("n_rows"),
                F.col(f"c{i}").cast("long").alias("n_chars"),
                F.col(f"t{i}").cast("long").alias("n_tokens"),
                dropped.alias("rows_dropped"),
            )
        )
    rows.append(
        F.struct(
            F.lit(5).cast("long").alias("stage_idx"),
            F.lit("pack").alias("stage"),
            F.col("n_bins").cast("long").alias("n_rows"),
            F.col("c4").cast("long").alias("n_chars"),
            F.col("t4").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("rows_dropped"),
        )
    )
    return tot.select(F.inline(F.array(*rows)))
