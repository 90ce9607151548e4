"""Registered sketch queries: KMV bottom-k cardinality / set-overlap
estimation and Count-Min frequency estimation over the events table.

Spark ships HLL++ and approx_count_distinct as its native sketches
(`agg_hll_distinct_users`); these register the hash-deterministic
classic family (operators/sketches.py) whose ENTIRE math — hashing,
order statistics, min-over-rows — the DuckDB oracle replays exactly,
so the estimator itself is hash-checked, not just the plumbing.

All estimates are also compared against exact values IN the query
output, so the oracle check covers the estimator error surface too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.dedup import MINHASH_P, perm_coeffs
from firefly_vcut_spark.operators.sketches import (
    cms_point_estimates,
    cms_table,
    kmv_bottom_k,
    kmv_estimate,
)
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_KMV_K = 64
_A1, _B1 = perm_coeffs(1)[0]
_CMS_DEPTH, _CMS_WIDTH = 4, 512
_CMS_COEFFS = perm_coeffs(_CMS_DEPTH)

_KMV_HASH_SQL = f"(({_A1} * user_id + {_B1}) % {MINHASH_P})"

_KMV_DISTINCT_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS g, {_KMV_HASH_SQL} AS h FROM events
),
ranked AS (
  SELECT g, h,
         row_number() OVER (PARTITION BY g ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY g) AS cnt
  FROM hashed
)
SELECT g AS event_type,
       CAST(max(cnt) AS BIGINT) AS n_distinct,
       round(CASE WHEN max(cnt) < {_KMV_K} THEN CAST(max(cnt) AS DOUBLE)
                  ELSE {float(_KMV_K - 1)} * {float(MINHASH_P)}
                       / CAST(max(CASE WHEN rn = {_KMV_K} THEN h END) AS DOUBLE)
             END, 4) AS kmv_estimate
FROM ranked
GROUP BY g
"""


@query(
    "agg_kmv_distinct_users",
    sql=_KMV_DISTINCT_SQL,
    tags=("agg", "distinct", "sketch", "extension"),
)
def agg_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-user estimate per event_type, next to
    the exact count carried through the same mergeable aggregation
    tree. The oracle replays the affine hash and the k-th-order-
    statistic estimator, so the sketch math itself is hash-checked —
    the deterministic counterpart of `agg_hll_distinct_users`.

    Scale: two bounded-state aggregations (per-(group,salt) partial
    bottom-k, then one merge per group); no partition ever holds a
    full group's hash set."""
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_bottom_k(ev, "event_type", "user_id", k=_KMV_K)
    return sk.select(
        "event_type",
        "n_distinct",
        F.round(kmv_estimate(F.col("kmv"), _KMV_K), 4).alias("kmv_estimate"),
    )


_KMV_OVERLAP_SQL = f"""
WITH flags AS (
  SELECT {_KMV_HASH_SQL} AS h,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ia,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ib
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
ranked AS (
  SELECT h, ia, ib, row_number() OVER (ORDER BY h) AS rn FROM flags
),
sketch AS (
  SELECT count(*) AS size_u,
         sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS shared,
         max(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
  FROM ranked WHERE rn <= {_KMV_K}
),
exact AS (
  SELECT count(*) AS exact_union,
         sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS exact_inter
  FROM flags
)
SELECT CAST(e.exact_union AS BIGINT) AS exact_union,
       CAST(e.exact_inter AS BIGINT) AS exact_intersection,
       round(CASE WHEN s.size_u < {_KMV_K} THEN CAST(s.size_u AS DOUBLE)
                  ELSE {float(_KMV_K - 1)} * {float(MINHASH_P)}
                       / CAST(s.hk AS DOUBLE) END, 4) AS est_union,
       round(CAST(s.shared AS DOUBLE) / CAST(s.size_u AS DOUBLE), 4)
         AS est_jaccard,
       round(CAST(s.shared AS DOUBLE) / CAST(s.size_u AS DOUBLE)
             * (CASE WHEN s.size_u < {_KMV_K} THEN CAST(s.size_u AS DOUBLE)
                     ELSE {float(_KMV_K - 1)} * {float(MINHASH_P)}
                          / CAST(s.hk AS DOUBLE) END), 4) AS est_intersection
FROM sketch s CROSS JOIN exact e
"""


@query(
    "agg_kmv_click_purchase_overlap",
    sql=_KMV_OVERLAP_SQL,
    tags=("agg", "sketch", "setop", "extension"),
)
def agg_kmv_click_purchase_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates: union size, Jaccard, and
    intersection size of the click-user and purchase-user sets from
    two bottom-k sketches ALONE (the union sketch is the k smallest
    of the two arrays' union; Jaccard = fraction of union-sketch
    members present in both sides), next to the exact values. This is
    the theta-sketch workflow: set algebra on O(k) state instead of
    shuffling the sets.

    Membership probes against each side's bottom-k are sound because
    any union-sketch member h ≤ h_(k)(A∪B) ≤ h_(k)(A), so h ∈ A ⇒
    h ∈ bottomk(A)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sk = kmv_bottom_k(ev, "event_type", "user_id", k=_KMV_K)
    a = sk.filter(F.col("event_type") == "click").select(
        F.col("kmv").alias("kmv_a"), F.col("n_distinct").alias("n_a")
    )
    b = sk.filter(F.col("event_type") == "purchase").select(
        F.col("kmv").alias("kmv_b"), F.col("n_distinct").alias("n_b")
    )
    u = F.slice(F.array_sort(F.array_union("kmv_a", "kmv_b")), 1, _KMV_K)
    both = a.crossJoin(b).select(
        u.alias("u"),
        F.col("kmv_a"),
        F.col("kmv_b"),
    )
    size_u = F.size("u")
    shared = F.size(
        F.filter(
            "u",
            lambda h: F.array_contains("kmv_a", h)
            & F.array_contains("kmv_b", h),
        )
    )
    est_union = kmv_estimate(F.col("u"), _KMV_K)
    est_jacc = shared.cast("double") / size_u.cast("double")
    # exact side: one distinct pass with per-side membership flags
    flags = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("ia"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("ib"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_union"),
            F.sum(
                F.when((F.col("ia") == 1) & (F.col("ib") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("exact_intersection"),
        )
    )
    return flags.crossJoin(
        both.select(
            F.round(est_union, 4).alias("est_union"),
            F.round(est_jacc, 4).alias("est_jaccard"),
            F.round(est_jacc * est_union, 4).alias("est_intersection"),
        )
    ).select(
        "exact_union",
        "exact_intersection",
        "est_union",
        "est_jaccard",
        "est_intersection",
    )


_CMS_COEFF_VALUES = ", ".join(
    f"({r}, {a}, {b})" for r, (a, b) in enumerate(_CMS_COEFFS)
)

_CMS_SQL = f"""
WITH coeff(r, a, b) AS (VALUES {_CMS_COEFF_VALUES}),
probes AS (
  SELECT e.user_id, c.r,
         ((c.a * e.user_id + c.b) % {MINHASH_P}) % {_CMS_WIDTH} AS bucket
  FROM events e CROSS JOIN coeff c
),
cms AS (
  SELECT r, bucket, count(*) AS n FROM probes GROUP BY r, bucket
),
exact AS (
  SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
),
est AS (
  SELECT p.user_id, min(cms.n) AS cms_estimate
  FROM (SELECT DISTINCT user_id, r, bucket FROM probes) p
  JOIN cms USING (r, bucket)
  GROUP BY p.user_id
)
SELECT CAST(e.user_id AS BIGINT) AS user_id,
       CAST(e.exact_n AS BIGINT) AS exact_n,
       CAST(est.cms_estimate AS BIGINT) AS cms_estimate
FROM exact e JOIN est USING (user_id)
ORDER BY e.exact_n DESC, e.user_id
LIMIT 20
"""


@query(
    "agg_cms_heavy_hitters",
    sql=_CMS_SQL,
    tags=("agg", "sketch", "topk", "extension"),
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the top-20 heaviest users,
    next to their exact counts — the heavy-hitters workflow where the
    4×512-counter sketch (O(1) state) stands in for a full per-key
    count. CMS error is one-sided (estimate ≥ exact, asserted in
    pytest); the overestimate magnitude is visible in the output and
    pinned by the oracle hash.

    Scale: the sketch build is one map-side-combinable groupBy to
    2048 rows; the probe side joins BROADCAST against it, so the only
    input-sized shuffles are the build's and the exact count's."""
    ev = load_table(spark, sf_dir, "events")
    cms = cms_table(ev, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    est = cms_point_estimates(
        exact.select("user_id"), cms, "user_id", _CMS_DEPTH, _CMS_WIDTH
    )
    return (
        exact.join(est, "user_id")
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(20)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "exact_n",
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
        )
    )


_WS_K = 50
(_WA1, _WB1), (_WA2, _WB2) = __import__(
    "firefly_vcut_spark.operators.dedup", fromlist=["perm_coeffs"]
).perm_coeffs(2)


@query(
    "corpus_weighted_sample",
    sql=f"""
    WITH w AS (
      SELECT doc_id, least(greatest(n_chars // 50, 1), 12) AS wt
      FROM documents
    ),
    keys AS (
      SELECT doc_id, wt,
             list_aggregate(
               list_transform(
                 list_transform(range(1, wt + 1),
                   j -> (({_WA1} * doc_id + {_WB1}) % {MINHASH_P}
                         + {_WA2} * j + {_WB2}) % {MINHASH_P}),
                 q -> (q * q + q) % {MINHASH_P}),
               'min') AS k
      FROM w
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(wt AS BIGINT) AS weight,
           CAST(k AS BIGINT) AS sample_key
    FROM keys ORDER BY k, doc_id LIMIT {_WS_K}
    """,
    tags=("corpus", "extension", "sampling"),
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (A-ES), hash-checkable:
    k=50 docs drawn with probability ∝ a length-derived integer
    weight, via the min-of-w-uniform-hashes key (exact integer
    equivalent of the u^(1/w) float key — see
    operators/corpus.weighted_sample_keys). The oracle replays every
    hash, so the SAMPLER ITSELF is verified, not just its row count —
    the float-key formulation can't do that across engines.

    Scale: the key is a pure projection (O(w) hashes per row in
    codegen, no RNG state, no shuffle); the draw is one global top-k
    (TakeOrderedAndProject — per-partition heaps, never a sort)."""
    from firefly_vcut_spark.operators.corpus import weighted_sample_keys

    docs = load_table(spark, sf_dir, "documents")
    wt = F.least(
        F.greatest(F.expr("n_chars div 50"), F.lit(1)), F.lit(12)
    )
    keyed = docs.select(
        "doc_id",
        wt.cast("long").alias("weight"),
        weighted_sample_keys(F.col("doc_id"), wt).alias("sample_key"),
    )
    return (
        keyed.orderBy(F.asc("sample_key"), F.asc("doc_id"))
        .limit(_WS_K)
        .select("doc_id", "weight", F.col("sample_key").cast("long").alias("sample_key"))
    )


_SAMP_FRAC_NUM = 10  # keep hashes < P/10 → ~10% sample


@query(
    "agg_sampled_percentiles",
    sql=f"""
    WITH s AS (
      SELECT value FROM events
      WHERE {_KMV_HASH_SQL} < {MINHASH_P} // {_SAMP_FRAC_NUM}
    ),
    full_q AS (
      SELECT round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.95), 4) AS p95
      FROM events
    ),
    samp_q AS (
      SELECT CAST(count(*) AS BIGINT) AS sample_n,
             round(quantile_cont(value, 0.5), 4) AS s_p50,
             round(quantile_cont(value, 0.95), 4) AS s_p95
      FROM s
    )
    SELECT samp_q.sample_n, full_q.p50, samp_q.s_p50, full_q.p95, samp_q.s_p95
    FROM full_q CROSS JOIN samp_q
    """,
    tags=("agg", "percentile", "sampling", "sketch", "extension"),
)
def agg_sampled_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-percentile estimation: exact interpolated p50/p95 on a
    deterministic ~10%% hash sample (user-keyed affine hash below
    P/10) next to the full-data exact values — the bridge between
    `agg_value_percentiles` (exact, per-group sort) and the
    approx_percentile sketch: a 10× cheaper sort whose error the
    output exposes and the oracle pins.

    Scale: the sample predicate is a pure scan filter (pushes to the
    row level, no shuffle until the percentile); sample size — and
    therefore the sort — shrinks 10× while both quantiles stay within
    sampling error (visible in the output columns)."""
    ev = load_table(spark, sf_dir, "events")
    h = (F.lit(_A1) * F.col("user_id") + F.lit(_B1)) % F.lit(MINHASH_P)
    samp = ev.filter(h < F.lit(MINHASH_P // _SAMP_FRAC_NUM))
    full_q = ev.agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )
    samp_q = samp.agg(
        F.count(F.lit(1)).cast("long").alias("sample_n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("s_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("s_p95"),
    )
    return samp_q.crossJoin(full_q).select(
        "sample_n", "p50", "s_p50", "p95", "s_p95"
    )


_JS_COEFF_VALUES = ", ".join(
    f"({r}, {a}, {b})" for r, (a, b) in enumerate(_CMS_COEFFS)
)
# inner-product error ~ N_R*N_S/w: the 512-bucket point-query width is
# collision-dominated for join sizing, so this query widens to 64k
# buckets (d*w = 256k counters - still O(1) vs the data)
_JS_WIDTH = 65536


@query(
    "agg_cms_join_size_estimate",
    sql=f"""
    WITH coeff(r, a, b) AS (VALUES {_JS_COEFF_VALUES}),
    cl AS (
      SELECT c.r,
             ((c.a * l.l_orderkey + c.b) % {MINHASH_P}) % {_JS_WIDTH} AS bucket,
             count(*) AS n
      FROM lineitem l CROSS JOIN coeff c GROUP BY 1, 2
    ),
    co AS (
      SELECT c.r,
             ((c.a * o.o_orderkey + c.b) % {MINHASH_P}) % {_JS_WIDTH} AS bucket,
             count(*) AS n
      FROM orders o CROSS JOIN coeff c GROUP BY 1, 2
    ),
    prod AS (
      SELECT cl.r, sum(cl.n * co.n) AS ip
      FROM cl JOIN co USING (r, bucket) GROUP BY cl.r
    ),
    est AS (SELECT min(ip) AS est_join_size FROM prod),
    exact AS (
      SELECT count(*) AS exact_join_size
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT CAST(exact.exact_join_size AS BIGINT) AS exact_join_size,
           CAST(est.est_join_size AS BIGINT) AS est_join_size
    FROM exact CROSS JOIN est
    """,
    tags=("agg", "sketch", "join", "scale", "extension"),
)
def agg_cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join size estimation by Count-Min INNER PRODUCT (Cormode &
    Muthukrishnan §4.3): |R ⋈ S| ≈ min over rows of Σ_b cms_R[r][b] ·
    cms_S[r][b] — the cardinality-estimation primitive a cost-based
    optimizer runs BEFORE committing to a join strategy, here next to
    the exact size so the (one-sided, ≥ exact) error is hash-pinned.

    Scale: each side reduces to a 2048-counter sketch in one map-side
    combinable pass (no join of the actual tables needed for the
    estimate!); the inner product joins two O(d·w) tables. The exact
    twin join in the output is the verification baseline."""
    from firefly_vcut_spark.operators.sketches import cms_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    cl = cms_table(li, "k", _CMS_DEPTH, _JS_WIDTH).withColumnRenamed("n", "nl")
    co = cms_table(o, "k", _CMS_DEPTH, _JS_WIDTH).withColumnRenamed("n", "no")
    est = (
        cl.join(co, ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("nl") * F.col("no")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_join_size"))
    )
    exact = li.join(o, "k").agg(
        F.count(F.lit(1)).cast("long").alias("exact_join_size")
    )
    return exact.crossJoin(est)
