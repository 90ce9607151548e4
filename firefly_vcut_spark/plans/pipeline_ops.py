"""Training-data pipeline operations over the documents corpus:
deterministic train/val/test split, stratified sampling, quality filter
chain, PII redaction, duplicate-cluster resolution, and sequence
packing — the corpus-preparation surface a 100 TB LLM data pipeline
runs between raw crawl and tokenizer (BASELINE.json north-star rows,
alongside dedup/ANN/text in plans/extensions.py).

All six are DuckDB-oracle-checked — including the two "inherently
sequential" ones: connected components (recursive-CTE transitive
closure twin) and next-fit packing (recursive-CTE fold twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators import corpus as cp
from firefly_vcut_spark.operators import text as tx
from firefly_vcut_spark.operators.dedup import ngram_jaccard_pairs
from firefly_vcut_spark.operators.skew import widen_if_narrow
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

# DuckDB mirrors of operators/text.py tokenization (see extensions.py).
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

# DuckDB mirror of operators/corpus.py split/sample hashes.
_SPLIT_BUCKET = f"((doc_id * {cp._SPLIT_A}) % {cp._SPLIT_MOD}) % 100"
_SAMPLE_HASH = f"(doc_id * {cp._SAMPLE_A} + {cp._SAMPLE_B}) % {cp._SAMPLE_P}"


@query(
    "corpus_split_train_val_test",
    sql=f"""
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train'
                  WHEN {_SPLIT_BUCKET} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split, lang
    """,
    tags=("corpus", "extension"),
)
def corpus_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split via multiplicative
    hashing of doc_id (operators/corpus.split_label) — assignment is a
    pure projection (no shuffle, no RNG state), stable under re-runs
    and cluster resizing, which is what prevents split leakage when a
    100 TB corpus is re-ingested incrementally. Output: docs and chars
    per (split, lang) — the balance check a split job emits."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("split", cp.split_label(F.col("doc_id")))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "corpus_stratified_sample",
    sql=f"""
    WITH h AS (
      SELECT doc_id, source, {_SAMPLE_HASH} AS hk FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)
               AS sample_rank
      FROM h
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 5
    """,
    tags=("corpus", "extension"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5-per-source deterministic stratified sample: rank each
    stratum by an affine hash of doc_id (a replayable 'random' order)
    and keep the top 5. One shuffle on the stratum key; no global
    sort. The eval-set construction / inspection-sample primitive."""
    d = load_table(spark, sf_dir, "documents")
    return cp.stratified_sample(d, F.col("source"), k=5).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("stratum").alias("source"),
        F.col("sample_rank").cast("bigint").alias("sample_rank"),
    )


@query(
    "corpus_quality_filter_chain",
    sql=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, source,
             len(toks) AS n,
             CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                  AS DOUBLE) / greatest(len(toks), 1) AS mt,
             CAST(len(list_filter(toks,
                  x -> list_contains(['the','a','of','and','to','in','is'], x)))
                  AS DOUBLE) / greatest(len(toks), 1) AS sw
      FROM t
    ),
    v AS (
      SELECT source,
             CASE WHEN n < 30 THEN 'drop_too_short'
                  WHEN mt < 3.0 OR mt > 8.0 THEN 'drop_token_len'
                  WHEN sw < 0.02 THEN 'drop_low_stopword'
                  ELSE 'keep' END AS verdict
      FROM m
    )
    SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs
    FROM v GROUP BY source, verdict
    """,
    tags=("corpus", "text", "extension"),
)
def corpus_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality filter chain: first-failing-rule verdict per
    doc (too short → token-length band → stopword floor → keep),
    aggregated per (source, verdict) — the drop-reason report a
    filtering job emits. All rules are pure-Column reuses of
    operators/text.py; one scan, one shuffle."""
    d = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n = tx.token_count(text)
    mt = tx.mean_token_len(text)
    sw = tx.stopword_ratio(text)
    verdict = (
        F.when(n < 30, F.lit("drop_too_short"))
        .when((mt < 3.0) | (mt > 8.0), F.lit("drop_token_len"))
        .when(sw < 0.02, F.lit("drop_low_stopword"))
        .otherwise(F.lit("keep"))
    )
    return (
        d.select("source", verdict.alias("verdict"))
        .groupBy("source", "verdict")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "corpus_pii_redaction",
    sql=f"""
    WITH aug AS (
      SELECT doc_id, source,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-867-' ||
                          lpad(CAST(1000 + doc_id % 9000 AS VARCHAR), 4, '0')
                     ELSE '' END AS body
      FROM documents
    ),
    m AS (
      SELECT source,
             len(regexp_extract_all(body, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(body, '{_PHONE_RE}')) AS n_phones,
             length(body)
               - length(regexp_replace(regexp_replace(body,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_PHONE_RE}', '<PHONE>', 'g'))
               AS chars_removed
      FROM aug
    )
    SELECT source,
           CAST(sum(n_emails) AS BIGINT) AS emails,
           CAST(sum(n_phones) AS BIGINT) AS phones,
           CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_pii,
           CAST(sum(chars_removed) AS BIGINT) AS chars_removed
    FROM m GROUP BY source
    """,
    tags=("corpus", "text", "extension"),
)
def corpus_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub + audit: count and redact email/phone patterns,
    report per-source match counts and net character delta. The
    synthetic corpus carries no PII, so both engines plant identical
    deterministic PII into a doc_id-keyed subset first (doc_id%7 →
    email, doc_id%11 → phone) — the redaction regexes then have real
    work and real negatives. JVM regex end-to-end; at 100 TB this is
    scan-shaped (no shuffle until the per-source rollup)."""
    d = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-867-"),
                F.lpad((1000 + F.col("doc_id") % 9000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("body"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    m = d.select(
        "source",
        body.alias("body"),
    ).select(
        "source",
        F.size(F.regexp_extract_all(F.col("body"), F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("body"), F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        (F.length("body") - F.length(redacted)).alias("chars_removed"),
    )
    return m.groupBy("source").agg(
        F.sum("n_emails").cast("bigint").alias("emails"),
        F.sum("n_phones").cast("bigint").alias("phones"),
        F.sum(F.when(F.col("n_emails") + F.col("n_phones") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("chars_removed").cast("bigint").alias("chars_removed"),
    )


@query(
    "corpus_dedup_components",
    sql=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id AS id, source AS block, list_distinct({_TOKS}) AS toks
      FROM documents
    ),
    sized AS (SELECT id, block, toks, len(toks) AS n_toks FROM base),
    tok AS (SELECT id, block, n_toks, unnest(toks) AS tok FROM sized),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM tok a JOIN tok b
        ON a.block = b.block AND a.tok = b.tok
       AND a.id < b.id AND b.id - a.id <= 60
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sized na ON na.id = i.id_a
      JOIN sized nb ON nb.id = i.id_b
      WHERE round(CAST(i.n_inter AS DOUBLE)
                  / (na.n_toks + nb.n_toks - i.n_inter), 4) >= 0.8
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
      UNION SELECT id_a, id_a FROM pairs
      UNION SELECT id_b, id_b FROM pairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT CAST(u AS BIGINT) AS doc_id,
           CAST(min(v) AS BIGINT) AS component
    FROM reach GROUP BY u
    """,
    tags=("corpus", "dedup", "extension", "bench"),
)
def corpus_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: near-dup pairs (token-set Jaccard
    >= 0.8 on blocked candidates — the dedup_ngram_jaccard pipeline)
    grouped into connected components by iterative min-label
    propagation; component id = min doc_id reachable, i.e. the
    canonical survivor each duplicate collapses to. The oracle twin is
    a recursive-CTE transitive closure — same fixpoint, declared
    recursively. At 100 TB the iteration count is graph diameter
    (near-dup blobs: 2-4), one bounded shuffle per round."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, blocking=F.col("source"), max_id_gap=60).filter(
        F.col("jaccard") >= 0.8
    )
    return cp.connected_components(pairs).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    )


@query(
    "corpus_pack_sequences",
    sql=f"""
    WITH RECURSIVE t AS (
      SELECT source, doc_id,
             list_aggregate(list_transform({_TOKS},
                 x -> CAST(ceil(length(x) / 4.0) AS BIGINT)), 'sum') AS n_tokens
      FROM documents
    ),
    seq AS (
      SELECT source, doc_id, n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM t
    ),
    pack AS (
      SELECT source, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.source, s.rn, s.doc_id, s.n_tokens,
             CASE WHEN p.fill + s.n_tokens <= 256 THEN p.bin_id
                  ELSE p.bin_id + 1 END,
             CASE WHEN p.fill + s.n_tokens <= 256 THEN p.fill + s.n_tokens
                  ELSE s.n_tokens END
      FROM pack p JOIN seq s ON s.source = p.source AND s.rn = p.rn + 1
    )
    SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM pack GROUP BY source, bin_id
    """,
    tags=("corpus", "extension", "bench"),
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: next-fit fold of docs
    (in doc_id order, subword token counts from operators/text.py)
    into 256-token bins per source. The fold is sequential within a
    source, so it runs as one applyInPandas pass per source — sources
    pack in parallel, which is the scale axis (shards are many, docs
    per shard bounded). Token counting stays JVM-side; Python carries
    only (bin, fill). The oracle twin expresses the same fold as a
    recursive CTE."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", tx.subword_count(F.col("text")).alias("n_tokens")
    )
    packed = cp.pack_next_fit(toks, capacity=256)
    return packed.groupBy("source", F.col("bin_id").cast("bigint").alias("bin_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


@query(
    "corpus_incremental_dedup",
    sql=f"""
    WITH fp AS (
      SELECT doc_id, source, md5({_NORM}) AS fingerprint FROM documents
    ),
    existing AS (SELECT * FROM fp WHERE doc_id % 5 <> 0),
    incoming AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
    survivors AS (
      SELECT i.doc_id, i.source, i.fingerprint
      FROM incoming i
      WHERE NOT EXISTS (SELECT 1 FROM existing e
                        WHERE e.fingerprint = i.fingerprint)
    ),
    ranked AS (
      SELECT doc_id, source, fingerprint,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id)
               AS rn
      FROM survivors
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, fingerprint
    FROM ranked WHERE rn = 1
    """,
    tags=("corpus", "dedup", "extension"),
)
def corpus_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup for continuous ingestion: an incoming
    batch (doc_id%5=0 stands in for 'today's crawl') is deduplicated
    (a) against the existing corpus via a fingerprint anti-join and
    (b) within itself via first-id-wins per fingerprint. At 100 TB the
    anti-join probes only fingerprints (16-byte digests, never text),
    and the existing side prunes to the fingerprint column of a
    digest-sorted index table — the whole corpus never rescans."""
    d = load_table(spark, sf_dir, "documents")
    from firefly_vcut_spark.operators.text import fingerprint_md5
    from pyspark.sql import Window

    fp = d.select(
        "doc_id", "source", fingerprint_md5(F.col("text")).alias("fingerprint")
    )
    existing = fp.filter(F.col("doc_id") % 5 != 0)
    incoming = fp.filter(F.col("doc_id") % 5 == 0)
    survivors = incoming.join(
        existing.select("fingerprint"), "fingerprint", "left_anti"
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "source", "fingerprint")
    )


@query(
    "corpus_centroid_assignment",
    sql="""
    WITH ev AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    flat AS (
      SELECT label, unnest(v) AS val,
             unnest(range(1, len(v)+1)) AS dim
      FROM ev
    ),
    cdim AS (
      SELECT label AS c_label, dim, round(avg(val), 6) AS cv
      FROM flat GROUP BY label, dim
    ),
    cent AS (
      SELECT c_label, list(cv ORDER BY dim) AS c_vec FROM cdim GROUP BY c_label
    ),
    scored AS (
      SELECT e.vec_id, e.label, c.c_label,
             round(list_cosine_similarity(e.v, c.c_vec), 4) AS cs
      FROM ev e CROSS JOIN cent c
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cs DESC, c_label ASC) AS rn
      FROM scored
    )
    SELECT CAST(label AS BIGINT) AS true_label,
           CAST(c_label AS BIGINT) AS assigned_label,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked WHERE rn = 1 GROUP BY label, c_label
    """,
    tags=("corpus", "vector", "extension"),
)
def corpus_centroid_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-clustering E-step: per-label mean embeddings become
    centroids (rounded to 6 decimals on both engines so partial-agg
    summation order can't leak into the ulps), every vector is
    assigned to its nearest centroid by cosine (rank on the rounded
    score, centroid-label tiebreak), and the output is the
    (true label × assigned label) confusion matrix — the purity
    report a semantic dedup / clustering job emits. Centroids are k
    rows → broadcast; the assignment pass is scan-shaped JVM fold
    math, the same shape as ann_bruteforce_topk."""
    from pyspark.sql import Window
    from firefly_vcut_spark.functions import vectors as vx

    e = load_table(spark, sf_dir, "embeddings")
    ev = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    flat = ev.select("label", F.posexplode("v").alias("pos", "val"))
    cdim = flat.groupBy("label", "pos").agg(F.round(F.avg("val"), 6).alias("cv"))
    cent = (
        cdim.groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s.cv,
            ).alias("c_vec")
        )
    )
    scored = ev.crossJoin(F.broadcast(cent)).withColumn(
        "cs", F.round(vx.cosine(F.col("v"), F.col("c_vec")), 4)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("c_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(
            F.col("label").cast("bigint").alias("true_label"),
            F.col("c_label").cast("bigint").alias("assigned_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@query(
    "corpus_decontaminate",
    sql=f"""
    WITH norm AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 4
                    THEN [array_to_string(t[i:i+3], ' ')
                          for i in range(1, len(t) - 2)]
                    ELSE []::VARCHAR[] END) AS gs
        FROM norm
    ),
    g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 41 = 0)
    SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 41 <> 0
    GROUP BY g.doc_id
    """,
    tags=("corpus", "extension"),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (train-test overlap removal): docs
    with doc_id % 41 == 0 stand in for the held-out eval suite; every
    other doc sharing any word 4-gram with that set is flagged with
    its shared-gram count — the n-gram containment recipe published
    LLM pipelines run before training. The benchmark gram set
    broadcasts; corpus grams never shuffle (operators/corpus.py
    decontaminate)."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0)
    corpus = widen_if_narrow(d.filter(F.col("doc_id") % 41 != 0))
    return cp.decontaminate(corpus, bench, n=4).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("n_shared_grams").cast("bigint").alias("n_shared_grams"),
    )


@query(
    "corpus_domain_mixture",
    sql=f"""
    WITH d AS (
        SELECT doc_id, source, CAST(substr(source, 4) AS INT) AS s
        FROM documents
    ),
    flagged AS (
        SELECT source, s,
               CASE WHEN (doc_id * {cp._MIX_A}) % {cp._SPLIT_MOD}
                         < CAST(s % 5 + 1 AS BIGINT) * {cp._SPLIT_MOD} // 5
                    THEN 1 ELSE 0 END AS kept
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           round((s % 5 + 1) / 5.0, 4) AS target_frac,
           round(sum(kept) * 1.0 / count(*), 4) AS actual_frac
    FROM flagged GROUP BY source, s
    """,
    tags=("corpus", "extension"),
)
def corpus_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture remix (DoReMi-style static weights): each source
    gets a target keep-fraction (here (src_num % 5 + 1)/5, a stand-in
    for learned mixture weights); rows are kept by the deterministic
    sample hash, so the remix is stable under re-runs and resizes and
    needs no shuffle until the per-source audit rollup. Output
    compares target vs realized fraction per source."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    s = F.substring("source", 4, 10).cast("int")
    frac = (s % 5 + 1) / F.lit(5.0)
    total = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    kept = (
        cp.mixture_sample(d, frac)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return (
        total.join(kept, "source", "left")
        .withColumn("s", F.substring("source", 4, 10).cast("int"))
        .select(
            "source",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round((F.col("s") % 5 + 1) / F.lit(5.0), 4).alias("target_frac"),
            F.round(
                F.coalesce(F.col("n_kept"), F.lit(0)) * 1.0 / F.col("n_total"), 4
            ).alias("actual_frac"),
        )
    )


@query(
    "corpus_shuffle_shard",
    sql=f"""
    WITH d AS (
        SELECT (((doc_id * {cp._MIX_A}) % {cp._SPLIT_MOD}) * 16)
                 // {cp._SPLIT_MOD} AS shard,
               len({_TOKS}) AS n_tokens
        FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM d GROUP BY shard
    """,
    tags=("corpus", "extension"),
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the final resharding
    step before training: every doc lands in one of 16 output shards
    by the HIGH bits of the uniform mixture hash ((hash * 16) >> 32 —
    see ``corpus.shard_bucket``: low bits of a Knuth multiplicative
    hash are a fixed permutation of doc_id mod 16 and would round-robin
    sequential ids in original order), which (a) decorrelates shard
    from source/time ordering (the 'global shuffle' training wants)
    and (b) is stable across runs and cluster sizes. Pure projection +
    one rollup shuffle; at 100 TB the same expression IS the
    partitionBy column of the final write. Output audits per-shard
    doc/token balance."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            cp.shard_bucket(F.col("doc_id"), 16).alias("shard"),
            tx.token_count(F.col("text")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(F.col("shard").cast("long").alias("shard"), "n_docs", "n_tokens")
    )


def _canonical_docs_sql() -> str:
    """Oracle for the LSH-chained canonical-survivor dedup: portable
    MinHash banding proposes candidate pairs over the PLAIN documents
    corpus, exact token-set Jaccard verifies them (>= 0.8), then the
    recursive-CTE transitive closure and the quality ranking pick one
    survivor per component — the same chain the Spark side runs."""
    from firefly_vcut_spark.plans.extensions import _minhash_portable_sql

    minhash = _minhash_portable_sql(
        corpus_sql="SELECT doc_id, text FROM documents"
    )
    return f"""
    WITH RECURSIVE cands AS MATERIALIZED (SELECT id_a, id_b FROM ({minhash}) mh),
    wanted AS (
      SELECT DISTINCT id
      FROM (SELECT id_a AS id FROM cands UNION ALL SELECT id_b AS id FROM cands)
    ),
    vbase AS MATERIALIZED (
      SELECT doc_id AS id, list_distinct({_TOKS}) AS toks,
             len(list_distinct({_TOKS})) AS n_toks
      FROM documents JOIN wanted ON wanted.id = documents.doc_id
    ),
    vtok AS MATERIALIZED (SELECT id, unnest(toks) AS tok FROM vbase),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cands c
      JOIN vtok a ON a.id = c.id_a
      JOIN vtok b ON b.id = c.id_b AND a.tok = b.tok
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT c.id_a, c.id_b
      FROM cands c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN vbase na ON na.id = c.id_a
      JOIN vbase nb ON nb.id = c.id_b
      WHERE round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
                  / (na.n_toks + nb.n_toks - coalesce(i.n_inter, 0)), 4) >= 0.8
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
      UNION SELECT id_a, id_a FROM pairs
      UNION SELECT id_b, id_b FROM pairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u),
    q AS (
      SELECT id, round(least(n_toks / 50.0, 1.0) * 40
             + CASE WHEN sw >= 0.03 AND sw <= 0.40 THEN 30.0 ELSE 10.0 END
             + CASE WHEN mt >= 3.0 AND mt <= 8.0 THEN 30.0 ELSE 10.0 END,
             4) AS quality
      FROM (
        SELECT doc_id AS id,
               len({_TOKS}) AS n_toks,
               CAST(len(list_filter({_TOKS},
                    x -> list_contains(['the','a','of','and','to','in','is'], x)))
                    AS DOUBLE) / greatest(len({_TOKS}), 1) AS sw,
               CAST(list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum')
                    AS DOUBLE) / greatest(len({_TOKS}), 1) AS mt
        FROM documents
      )
    ),
    ranked AS (
      SELECT c.component, c.id, q.quality,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.quality DESC, c.id ASC) AS rnk,
             count(*) OVER (PARTITION BY c.component) AS n_members
      FROM comp c JOIN q ON q.id = c.id
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(id AS BIGINT) AS survivor_doc_id,
           quality AS survivor_quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rnk = 1
    """


@query(
    "corpus_canonical_docs",
    sql=_canonical_docs_sql(),
    tags=("corpus", "dedup", "extension", "lsh"),
)
def corpus_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection per duplicate cluster: instead of
    keeping the min-id doc, keep the HIGHEST-QUALITY member of each
    near-dup component (quality-aware dedup — what production corpus
    dedup actually ships). Pairs come from the production LSH chain —
    MinHash banding proposes candidates (one bucket shuffle, O(n)
    signatures, no id-gap/blocking assumption), exact token-set
    Jaccard verifies exactly those pairs — then connected components
    and the quality score pick survivors; the per-cluster argmax is a
    single max-of-ordering-struct aggregation (no window sort),
    tie-broken toward the smaller doc_id. Portable hash family so the
    whole chain is DuckDB-hash-checked."""
    from firefly_vcut_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_verify,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text")
    cands = minhash_lsh_candidates(docs, hash_mode="portable").select(
        "id_a", "id_b"
    )
    pairs = ngram_jaccard_verify(docs, cands).filter(F.col("jaccard") >= 0.8)
    comps = cp.connected_components(pairs)
    quality = d.select(
        F.col("doc_id").alias("id"), tx.quality_score(F.col("text")).alias("quality")
    )
    ord_struct = F.struct(
        F.col("quality").alias("q"),
        (-F.col("id")).alias("negid"),
        F.col("id").alias("did"),
    )
    return (
        comps.join(quality, "id")
        .groupBy("component")
        .agg(
            F.max(ord_struct).alias("best"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .select(
            F.col("component").cast("bigint").alias("component"),
            F.col("best.did").cast("bigint").alias("survivor_doc_id"),
            F.col("best.q").cast("double").alias("survivor_quality"),
            "n_members",
        )
    )


_DUP_K = 8


@query(
    "corpus_dup_span_removal",
    sql=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id,
               array_to_string(list_slice({_TOKS}, 1, 25), ' ') AS text
        FROM documents WHERE doc_id % 13 = 0 AND len({_TOKS}) >= 25
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
    grams AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(list_slice(t, i, i + {_DUP_K - 1}), ' ')) AS g
        FROM toks, UNNEST(range(1, greatest(len(t) - {_DUP_K - 1}, 0) + 1)) AS u(i)
    ),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    covered AS (
        SELECT DISTINCT doc_id, pos + off AS pos
        FROM (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dupg)) s,
             UNNEST(range(0, {_DUP_K})) AS o(off)
    ),
    tokpos AS (
        SELECT doc_id, UNNEST(t) AS tok, UNNEST(range(1, len(t) + 1)) AS pos
        FROM toks
    ),
    kept AS (
        SELECT tp.doc_id,
               count(*) AS n_kept,
               md5(string_agg(tp.tok, ' ' ORDER BY tp.pos)) AS kept_md5
        FROM tokpos tp
        ANTI JOIN covered c ON tp.doc_id = c.doc_id AND tp.pos = c.pos
        GROUP BY tp.doc_id
    ),
    totals AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.n_tokens - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(k.kept_md5, md5('')) AS kept_md5
    FROM totals t LEFT JOIN kept k ON t.doc_id = k.doc_id
    """,
    tags=("corpus", "extension", "dedup"),
)
def corpus_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring removal over a planted-overlap corpus
    (operators/dedup.dup_span_removal): every 13th sufficiently-long
    doc re-appears under a shifted id as its own 25-token prefix, so
    the detector provably fires on partial overlap — the planted docs
    vanish entirely (their every 8-gram recurs in the source doc) and
    the source docs lose exactly their first 25 tokens, while natural
    within-corpus repeated 8-grams are scrubbed too. Output audits
    per-doc token/removal counts plus an md5 of the surviving token
    sequence, so the correctness hash pins the rebuilt text without
    shipping it."""
    from firefly_vcut_spark.operators.dedup import dup_span_removal

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tx.tokens(F.col("text"))
    planted = d.filter((F.col("doc_id") % 13 == 0) & (F.size(t) >= 25)).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(t, 1, 25), " ").alias("text"),
    )
    return dup_span_removal(d.unionByName(planted), k=_DUP_K)


@query(
    "corpus_boilerplate_grams",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0
                  THEN 'follow ' || source || ' for updates ' || text
                  ELSE text END AS text
      FROM documents
    ),
    norm AS (SELECT doc_id, source, {_TOKS} AS t FROM corpus),
    grams AS (
        SELECT doc_id, source,
               list_distinct(CASE WHEN len(t) >= 4
                    THEN [array_to_string(t[i:i+3], ' ')
                          for i in range(1, len(t) - 2)]
                    ELSE []::VARCHAR[] END) AS gs
        FROM norm
    ),
    g AS (SELECT doc_id, source, unnest(gs) AS gram FROM grams),
    per_sg AS (SELECT source, gram, count(*) AS n_docs FROM g GROUP BY 1, 2),
    tot AS (SELECT source, count(*) AS src_docs FROM corpus GROUP BY 1)
    SELECT p.source, p.gram,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(t.src_docs AS BIGINT) AS src_docs,
           round(p.n_docs * 1.0 / t.src_docs, 4) AS frac
    FROM per_sg p JOIN tot t USING (source)
    WHERE t.src_docs >= 5 AND p.n_docs * 1.0 / t.src_docs >= 0.25
    """,
    tags=("corpus", "extension"),
)
def corpus_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate template detection (the CCNet per-domain
    dedup signal): word 4-grams present in ≥25% of a source's docs are
    site templates, not content — the removal list a crawl pipeline
    feeds back into span scrubbing. A deterministic template
    ('follow <source> for updates') is planted on every third doc so
    the detector provably fires per source.

    Scale shape: per-doc DISTINCT grams ride the scan (array_distinct
    in codegen), ONE shuffle on (source, gram) whose width is bounded
    by the per-source template vocabulary after the threshold, and the
    per-source totals broadcast."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("follow "), F.col("source"), F.lit(" for updates "), F.col("text")
            ),
        ).otherwise(F.col("text")),
    )
    # token array bound in a child projection (decon_sql's O(len²)
    # inline-split trap; r8)
    grams = (
        widen_if_narrow(docs)
        .select("doc_id", "source", tx.tokens(F.col("text")).alias("tk"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(tx.word_ngrams(F.col("tk"), 4))
            ).alias("gram"),
        )
    )
    per_sg = grams.groupBy("source", "gram").agg(F.count("*").alias("n_docs"))
    tot = docs.groupBy("source").agg(F.count("*").alias("src_docs"))
    return (
        per_sg.join(F.broadcast(tot.filter(F.col("src_docs") >= 5)), "source")
        .withColumn("frac", F.round(F.col("n_docs") * 1.0 / F.col("src_docs"), 4))
        .filter(F.col("n_docs") * 1.0 / F.col("src_docs") >= 0.25)
        .select(
            F.col("source").cast("string").alias("source"),
            F.col("gram").cast("string").alias("gram"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("src_docs").cast("bigint").alias("src_docs"),
            F.col("frac").cast("double").alias("frac"),
        )
    )


_QUALITY_SQL = f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    m AS (
        SELECT doc_id, source,
               len(toks) AS n,
               CAST(len(list_filter(toks,
                    x -> list_contains(['the','a','of','and','to','in','is'], x)))
                    AS DOUBLE) / greatest(len(toks), 1) AS sw,
               CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                    AS DOUBLE) / greatest(len(toks), 1) AS mt
        FROM t
    ),
    s AS (
      SELECT doc_id, source,
             round(least(n / 50.0, 1.0) * 40
                   + CASE WHEN sw >= 0.03 AND sw <= 0.40 THEN 30.0 ELSE 10.0 END
                   + CASE WHEN mt >= 3.0 AND mt <= 8.0 THEN 30.0 ELSE 10.0 END,
                   4) AS q
      FROM m
    )"""


@query(
    "corpus_quality_percentile_filter",
    sql=f"""{_QUALITY_SQL},
    cut AS (SELECT source, round(quantile_cont(q, 0.10), 4) AS p10
            FROM s GROUP BY 1)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS src_docs,
           CAST(count(CASE WHEN s.q >= c.p10 THEN 1 END) AS BIGINT) AS n_kept,
           CAST(max(c.p10) AS DOUBLE) AS p10_cutoff
    FROM s JOIN cut c USING (source)
    GROUP BY 1
    """,
    tags=("corpus", "extension", "percentile"),
)
def corpus_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-relative quality filtering: per-SOURCE 10th-
    percentile quality cutoff, keep docs at or above their source's
    cutoff — the adaptive-threshold recipe (a fixed global threshold
    over- or under-filters heterogeneous sources). Spark percentile()
    and DuckDB quantile_cont share the interpolated definition; at
    100 TB swap in approx_percentile (mergeable sketch, no per-group
    sort) and the cutoff table still BROADCASTS (O(sources))."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", tx.quality_score(F.col("text")).alias("q")
    )
    cut = scored.groupBy("source").agg(
        F.round(F.expr("percentile(q, 0.10)"), 4).alias("p10")
    )
    return (
        scored.join(F.broadcast(cut), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("src_docs"),
            F.count(F.when(F.col("q") >= F.col("p10"), 1))
            .cast("bigint")
            .alias("n_kept"),
            F.max("p10").cast("double").alias("p10_cutoff"),
        )
        .select(
            F.col("source").cast("string").alias("source"),
            "src_docs",
            "n_kept",
            "p10_cutoff",
        )
    )


@query(
    "corpus_prepare_manifest",
    sql=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks, md5({_NORM}) AS digest FROM documents
    ),
    corpus0 AS (SELECT * FROM base WHERE doc_id % 41 <> 0),
    m AS (
      SELECT doc_id, toks, digest,
             len(toks) AS n,
             CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                  AS DOUBLE) / greatest(len(toks), 1) AS mt,
             CAST(len(list_filter(toks,
                  x -> list_contains(['the','a','of','and','to','in','is'], x)))
                  AS DOUBLE) / greatest(len(toks), 1) AS sw
      FROM corpus0
    ),
    corpus1 AS (
      SELECT doc_id, toks, digest FROM m
      WHERE n >= 30 AND mt >= 3.0 AND mt <= 8.0 AND sw >= 0.02
    ),
    corpus2 AS (
      SELECT doc_id, toks FROM (
        SELECT doc_id, toks,
               min(doc_id) OVER (PARTITION BY digest) AS keep_id
        FROM corpus1) t
      WHERE doc_id = keep_id
    ),
    bench_g AS (
      SELECT DISTINCT unnest(list_distinct(CASE WHEN len(toks) >= 4
                 THEN [array_to_string(toks[i:i+3], ' ')
                       for i in range(1, len(toks) - 2)]
                 ELSE []::VARCHAR[] END)) AS gram
      FROM base WHERE doc_id % 41 = 0
    ),
    doc_g AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(toks) >= 4
                 THEN [array_to_string(toks[i:i+3], ' ')
                       for i in range(1, len(toks) - 2)]
                 ELSE []::VARCHAR[] END)) AS gram
      FROM corpus2
    ),
    flagged AS (SELECT DISTINCT doc_id FROM doc_g JOIN bench_g USING (gram)),
    corpus3 AS (
      SELECT doc_id, len(toks) AS n_tokens FROM corpus2
      WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    )
    SELECT CASE WHEN ((doc_id * {cp._SPLIT_A}) % {cp._SPLIT_MOD}) % 100 < 90
                THEN 'train'
                WHEN ((doc_id * {cp._SPLIT_A}) % {cp._SPLIT_MOD}) % 100 < 95
                THEN 'val' ELSE 'test' END AS split,
           CAST((((doc_id * {cp._MIX_A}) % {cp._SPLIT_MOD}) * 16)
                 // {cp._SPLIT_MOD} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM corpus3 GROUP BY 1, 2
    """,
    tags=("corpus", "extension", "pipeline"),
)
def corpus_prepare_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CHAINED corpus-preparation pipeline, end to end in one
    query: eval holdout (doc_id%41 docs become the decontamination
    benchmark and leave the corpus) → C4 quality chain → exact dedup
    (min-id survivor per content digest) → 4-gram decontamination
    against the holdout → deterministic split + global shuffle-shard,
    emitting the per-(split, shard) doc/token manifest a training job
    consumes. Every stage is the already-tested standalone operator;
    this proves they COMPOSE (stage order matters — dedup sees only
    quality survivors, decontamination only dedup survivors).

    Scale shape: the chain is scan → scan-shaped filters → one digest
    window → one broadcast gram join → one rollup; near-dup canonical
    dedup (the LSH chain) slots in between stages 2 and 3 as its own
    standalone operator (corpus_canonical_docs)."""
    d = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    # stage 0: eval holdout out of the corpus
    corpus0 = d.filter(F.col("doc_id") % 41 != 0)
    # stage 1: quality chain keepers
    n = tx.token_count(text)
    mt = tx.mean_token_len(text)
    sw = tx.stopword_ratio(text)
    corpus1 = corpus0.filter(
        (n >= 30) & (mt >= 3.0) & (mt <= 8.0) & (sw >= 0.02)
    ).select("doc_id", "text")
    # stage 2: exact dedup, min-id survivor per digest
    from pyspark.sql import Window as W

    digest = tx.fingerprint_md5(F.col("text"))
    corpus2 = (
        corpus1.withColumn("digest", digest)
        .withColumn("keep_id", F.min("doc_id").over(W.partitionBy("digest")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
    )
    # stage 3: decontaminate vs the holdout's 4-gram set (broadcast)
    # token arrays bound in a child projection (decon_sql's O(len²)
    # inline-split trap; r8)
    grams4 = lambda t: F.array_distinct(tx.word_ngrams(t, 4))  # noqa: E731
    bench_g = (
        d.filter(F.col("doc_id") % 41 == 0)
        .select(tx.tokens(F.col("text")).alias("tk"))
        .select(F.explode(grams4(F.col("tk"))).alias("gram"))
        .distinct()
    )
    doc_g = corpus2.select(
        "doc_id", tx.tokens(F.col("text")).alias("tk")
    ).select("doc_id", F.explode(grams4(F.col("tk"))).alias("gram"))
    flagged = doc_g.join(F.broadcast(bench_g), "gram").select("doc_id").distinct()
    corpus3 = corpus2.join(flagged, "doc_id", "left_anti")
    # stage 4: split + shard manifest
    return (
        corpus3.select(
            cp.split_label(F.col("doc_id")).alias("split"),
            cp.shard_bucket(F.col("doc_id")).cast("bigint").alias("shard"),
            tx.token_count(F.col("text")).alias("n_tokens"),
        )
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


@query(
    "corpus_temperature_mixture",
    sql=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
    ),
    weights AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w
      FROM counts
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS sumw FROM weights),
    targets AS (
      SELECT w.source, w.n_docs, w.w,
             (2000 * w.w) // t.sumw AS k_target
      FROM weights w CROSS JOIN tot t
    ),
    ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (PARTITION BY d.source
                 ORDER BY (d.doc_id * {cp._SAMPLE_A} + {cp._SAMPLE_B})
                          % {cp._SAMPLE_P}, d.doc_id) AS rnk
      FROM documents d
    ),
    taken AS (
      SELECT r.source, count(*) AS n_taken
      FROM ranked r JOIN targets tg USING (source)
      WHERE r.rnk <= tg.k_target
      GROUP BY 1
    )
    SELECT tg.source, tg.n_docs, tg.w AS weight,
           CAST(tg.k_target AS BIGINT) AS k_target,
           CAST(coalesce(tk.n_taken, 0) AS BIGINT) AS n_taken
    FROM targets tg LEFT JOIN taken tk USING (source)
    """,
    tags=("corpus", "extension", "pipeline"),
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (α=0.5, the multilingual /
    multi-source rebalancing recipe: sample fractions ∝ size^α so
    small sources are upweighted): per-source targets from
    INTEGER-quantized sqrt weights (floor(√n·1e6) summed as ints — no
    float-summation order anywhere), then exactly-k deterministic
    selection per source via the affine sample hash. Output is the
    per-source mixture manifest. The weight table is O(sources) and
    driver-computed (like every model fit in this repo); selection is
    one rank window per source."""
    import math

    d = load_table(spark, sf_dir, "documents")
    counts = {r.source: r.n for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    weights = {s: int(math.floor(math.sqrt(n) * 1_000_000)) for s, n in counts.items()}
    sumw = sum(weights.values())
    targets = [
        (s, counts[s], weights[s], (2000 * weights[s]) // sumw)
        for s in sorted(counts)
    ]
    tg = spark.createDataFrame(
        targets, "source string, n_docs long, weight long, k_target long"
    )

    from pyspark.sql import Window as W

    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(cp.sample_hash(F.col("doc_id")), "doc_id")
    )
    taken = (
        d.select("doc_id", "source")
        .withColumn("rnk", rnk)
        .join(F.broadcast(tg.select("source", "k_target")), "source")
        .filter(F.col("rnk") <= F.col("k_target"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_taken"))
    )
    return (
        tg.join(taken, "source", "left")
        .select(
            F.col("source").cast("string").alias("source"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("weight").cast("bigint").alias("weight"),
            F.col("k_target").cast("bigint").alias("k_target"),
            F.coalesce(F.col("n_taken"), F.lit(0)).cast("bigint").alias("n_taken"),
        )
    )


def _cluster_safe_split_sql() -> str:
    """Oracle for the leakage-safe split: reuse the canonical-dedup
    chain's candidate→verify→closure prefix (everything up to the comp
    CTE), then assign every doc its cluster representative and split
    on the REPRESENTATIVE's hash."""
    base = _canonical_docs_sql()
    head, sep, _tail = base.partition(",\n    q AS (")
    assert sep, "canonical SQL changed; update the split point"
    rep_bucket = f"((rep * {cp._SPLIT_A}) % {cp._SPLIT_MOD}) % 100"
    return f"""{head},
    compm AS MATERIALIZED (SELECT id, component FROM comp),
    rep AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
      FROM documents d LEFT JOIN compm c ON c.id = d.doc_id
    ),
    labeled AS MATERIALIZED (
      SELECT doc_id, rep,
             CASE WHEN {rep_bucket} < 90 THEN 'train'
                  WHEN {rep_bucket} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM rep
    ),
    leak AS (
      SELECT CAST(count(*) AS BIGINT) AS n_leaky_groups FROM (
        SELECT rep FROM labeled GROUP BY rep
        HAVING count(DISTINCT split) > 1)
    )
    SELECT l.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT l.rep) AS BIGINT) AS n_groups,
           k.n_leaky_groups
    FROM labeled l CROSS JOIN leak k
    GROUP BY l.split, k.n_leaky_groups
    """


@query(
    "corpus_cluster_safe_split",
    sql=_cluster_safe_split_sql(),
    tags=("corpus", "dedup", "extension", "lsh"),
)
def corpus_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents
    must land in the SAME split (a near-copy of a training doc inside
    the test set silently inflates eval), so the split hash keys on
    each doc's duplicate-CLUSTER representative — LSH candidates →
    exact-Jaccard verify → connected components, singletons
    representing themselves — instead of the doc id. Output: per-split
    doc/group counts plus the leakage audit (clusters straddling
    splits — structurally zero, and the oracle recomputes that fact
    independently). At 100 TB this reuses the dedup job's component
    output; the split stays a pure projection on top of it."""
    from firefly_vcut_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_verify,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text")
    cands = minhash_lsh_candidates(docs, hash_mode="portable").select("id_a", "id_b")
    pairs = ngram_jaccard_verify(docs, cands).filter(F.col("jaccard") >= 0.8)
    comps = cp.connected_components(pairs).withColumnRenamed("id", "doc_id")
    labeled = (
        docs.select("doc_id")
        .join(comps, "doc_id", "left")
        .withColumn("rep", F.coalesce(F.col("component"), F.col("doc_id")))
        .withColumn("split", cp.split_label(F.col("rep")))
    )
    leaky = (
        labeled.groupBy("rep")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaky_groups"))
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("rep").cast("bigint").alias("n_groups"),
        )
        .crossJoin(F.broadcast(leaky))
        .select("split", "n_docs", "n_groups", "n_leaky_groups")
    )
