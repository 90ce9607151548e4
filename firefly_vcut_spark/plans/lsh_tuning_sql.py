"""MinHash-LSH banding-parameter tuning — the eval a production dedup
pipeline runs when blocking recall drifts (SURVEY extension; the
100 TB follow-through of r8's honest sf10 finding that the default
8 bands × 4 rows banding recovered only 0.743 of sampled truth pairs,
exactly as the S-curve 1-(1-J^r)^b predicts at the sample's J≈0.6
mass — SCALING.md §sf10).

``dedup_lsh_band_tuning`` sweeps candidate bandings (b, r) against the
MEASURED pair-Jaccard distribution (exact AllPairs truth pairs, the
same chain dedup_allpairs_prefix hash-checks) and emits, per
candidate, the expected blocking recall over that distribution plus
the analytic false-positive rate at a background similarity J = 0.3;
the chosen row is the cheapest banding meeting the target recall.

Integer-exact discipline: every probability lives in floored
parts-per-million. j_ppm = (ix · 10⁶) DIV union; powers are computed
by SQUARE-AND-MULTIPLY (binary exponentiation with a floor
x ← (x · y) DIV 10⁶ after every product — flooring order matters, so a
left-fold would give different low digits). The identical expression
text is generated for both engines (only the integer-division token
differs), so the oracle hash match is bit-for-bit with no pow()/float
edge anywhere.

Scale shape: the truth side is the AllPairs prefix join (heavy by its
ORACLE replay, like dedup_lsh_recall; on a 100 TB corpus it runs on a
deterministic sample — the sf10 measurement uses doc_id % 10 = 0).
The sweep itself is ONE pass over the O(truth pairs) relation
computing all candidate detect-columns map-side, one scalar aggregate,
then a 6-row unpivot — nothing downstream of the pair table scales
with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.affinity_sql import (
    ALLPAIRS_TAU,
    _allpairs_ver_cte,
    allpairs_verified_pairs,
)
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_PPM = 1_000_000

# Candidate bandings (bands, rows_per_band). num_hashes = b·r is the
# signature cost (shuffle bytes + band-bucket rows scale with b).
# 8×4 is the engine default (operators/dedup.py); the rest bracket it
# along both axes so the sweep can move recall up (more bands) or
# false positives down (more rows per band).
CANDIDATE_BANDINGS: tuple[tuple[int, int], ...] = (
    (8, 4),
    (16, 4),
    (32, 4),
    (64, 4),
    (16, 2),
    (4, 8),
)

# Expected-recall target for the chosen banding (ppm): the production
# bar the r8 sf10 sample showed 8×4 missing (0.743).
TARGET_RECALL_PPM = 900_000

# Background (non-dup) similarity at which the analytic FP rate is
# reported: well below ALLPAIRS_TAU, the mass where a band collision
# is a wasted verify.
_FP_REF_J_PPM = 300_000


def _pow_ppm(x: str, k: int, div: str) -> str:
    """Floored fixed-point x^k in ppm as an expression string, by
    SQUARE-AND-MULTIPLY (LSB-first binary exponentiation with a floor
    after every product) — O(log k) nesting depth so a b = 64 power
    stays far inside DuckDB's 128-deep binder limit, where a k-fold
    left-fold would not. Deterministic and engine-identical: every
    intermediate is a floored BIGINT (operands ≤ 10⁶ keep products
    ≤ 10¹²), and ``detect_ppm_py`` replays the same sequence."""
    assert k >= 1
    result = None  # accumulated product expression (None ⇔ ppm ONE)
    base = x
    kk = k
    while kk:
        if kk & 1:
            result = base if result is None else f"((({result}) * ({base})) {div} {_PPM})"
        kk >>= 1
        if kk:
            base = f"((({base}) * ({base})) {div} {_PPM})"
    return result


def _detect_ppm_expr(j: str, bands: int, rows: int, div: str) -> str:
    """S-curve detect probability 1-(1-j^r)^b in floored ppm."""
    jr = _pow_ppm(j, rows, div)
    miss = f"({_PPM} - {jr})"
    return f"({_PPM} - {_pow_ppm(miss, bands, div)})"


def _pow_ppm_py(x: int, k: int) -> int:
    """Python referee for ``_pow_ppm``: the SAME square-and-multiply
    flooring sequence (flooring order matters — a left-fold floors
    differently)."""
    result = None
    base = x
    while k:
        if k & 1:
            result = base if result is None else (result * base) // _PPM
        k >>= 1
        if k:
            base = (base * base) // _PPM
    return result


def detect_ppm_py(j_ppm: int, bands: int, rows: int) -> int:
    """Python referee for the generated detect expressions, used by
    tests and to bake the analytic FP literals below."""
    miss = _PPM - _pow_ppm_py(j_ppm, rows)
    return _PPM - _pow_ppm_py(miss, bands)


def _tuning_sql() -> str:
    """DuckDB oracle: AllPairs ver CTE → j_ppm → one aggregate with a
    detect-sum per candidate → 6-row candidate table with the chosen
    flag. fp_at_j03_ppm is a pure literal (same floored algorithm,
    evaluated in Python at J = 0.3 — data-independent)."""
    det_sums = ",\n               ".join(
        f"CAST(sum({_detect_ppm_expr('j_ppm', b, r, '//')}) AS BIGINT) AS s_{b}_{r}"
        for b, r in CANDIDATE_BANDINGS
    )
    cand_rows = "\n        UNION ALL\n        ".join(
        f"SELECT {b} AS bands, {r} AS rows_per_band, {b * r} AS num_hashes, "
        f"{detect_ppm_py(_FP_REF_J_PPM, b, r)} AS fp_at_j03_ppm, "
        # recall over an empty truth set is defined as 0 — without the
        # guard Spark's ANSI DIV throws DIVIDE_BY_ZERO while DuckDB's
        # // returns NULL (engine-divergent; same guard as drift_sql).
        f"CASE WHEN n > 0 THEN s_{b}_{r} // n ELSE 0 END "
        f"AS exp_recall_ppm, n FROM s"
        for b, r in CANDIDATE_BANDINGS
    )
    return f"""
    WITH {_allpairs_ver_cte()},
    pairs AS (
        SELECT (ix * {_PPM}) // (sza + szb - ix) AS j_ppm
        FROM ver WHERE ix / (sza + szb - ix) >= {ALLPAIRS_TAU}
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               {det_sums}
        FROM pairs
    ),
    sweep AS (
        {cand_rows}
    ),
    sweep_ranked AS (
        SELECT *,
               row_number() OVER (
                   ORDER BY (exp_recall_ppm >= {TARGET_RECALL_PPM}) DESC,
                            fp_at_j03_ppm ASC, num_hashes ASC, bands ASC
               ) AS rk
        FROM sweep
    )
    SELECT CAST(bands AS BIGINT) AS bands,
           CAST(rows_per_band AS BIGINT) AS rows_per_band,
           CAST(num_hashes AS BIGINT) AS num_hashes,
           CAST(n AS BIGINT) AS n_truth_pairs,
           CAST(exp_recall_ppm AS BIGINT) AS exp_recall_ppm,
           CAST(fp_at_j03_ppm AS BIGINT) AS fp_at_j03_ppm,
           CAST(CASE WHEN rk = 1
                      AND exp_recall_ppm >= {TARGET_RECALL_PPM}
                     THEN 1 ELSE 0 END AS BIGINT) AS chosen
    FROM sweep_ranked
    """


@query(
    "dedup_lsh_band_tuning",
    sql=_tuning_sql(),
    tags=("dedup", "extension", "lsh", "eval", "tuning"),
)
def dedup_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-parameter sweep against the measured truth-pair Jaccard
    distribution: one row per candidate (bands, rows_per_band) with
    its S-curve expected recall over the exact-AllPairs truth pairs
    (floored-ppm integer math, bit-for-bit with the oracle), the
    analytic false-positive rate at background J = 0.3, and a chosen
    flag — the lowest-FP banding meeting the 0.9 recall target,
    signature cost as tie-break. On the r8 sf10 sample distribution
    (J≈0.6 mass, where the default 8×4 measured recall 0.743) the
    sweep picks 16×4 (expected 0.954), and the measured recall with
    16×4 banding on that same sample is 0.9201 — the empirical
    confirmation lives in tools/lsh_band_check.py + SCALING.md §sf10."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = allpairs_verified_pairs(docs).select(
        F.expr(f"(ix * {_PPM}) DIV (sza + szb - ix)").alias("j_ppm")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")] + [
        F.expr(f"sum({_detect_ppm_expr('j_ppm', b, r, 'DIV')})")
        .cast("long")
        .alias(f"s_{b}_{r}")
        for b, r in CANDIDATE_BANDINGS
    ]
    s = pairs.agg(*aggs)
    cand = s.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("bands"),
                        F.lit(r).cast("long").alias("rows_per_band"),
                        F.lit(b * r).cast("long").alias("num_hashes"),
                        F.lit(detect_ppm_py(_FP_REF_J_PPM, b, r))
                        .cast("long")
                        .alias("fp_at_j03_ppm"),
                        F.expr(
                            f"CASE WHEN n > 0 THEN s_{b}_{r} DIV n "
                            f"ELSE 0 END"
                        )
                        .cast("long")
                        .alias("exp_recall_ppm"),
                    )
                    for b, r in CANDIDATE_BANDINGS
                ]
            )
        ).alias("c"),
    ).select("c.*", F.col("n").alias("n_truth_pairs"))
    from pyspark.sql import Window

    w = Window.orderBy(
        (F.col("exp_recall_ppm") >= TARGET_RECALL_PPM).desc(),
        F.col("fp_at_j03_ppm").asc(),
        F.col("num_hashes").asc(),
        F.col("bands").asc(),
    )
    return cand.withColumn("rk", F.row_number().over(w)).select(
        "bands",
        "rows_per_band",
        "num_hashes",
        "n_truth_pairs",
        "exp_recall_ppm",
        "fp_at_j03_ppm",
        F.when(
            (F.col("rk") == 1) & (F.col("exp_recall_ppm") >= TARGET_RECALL_PPM),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("chosen"),
    )
