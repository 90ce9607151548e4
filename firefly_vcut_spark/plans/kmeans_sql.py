"""Full-data distributed k-means (Lloyd), every round's M-step an
aggregate over ALL vectors — the clustering recipe data-curation
pipelines run when a sample-fit quantizer isn't enough (the
sample-fit variant backs IVF/SemDeDup: ``operators/ann.py::
fit_lloyd_sample``; this is the same math with the mean computed
distributed).

Engine-parity discipline (the PageRank/BPE playbook): every quantity
is an integer — coordinates quantize once to micro-ticks shifted into
the positive domain (so ``div`` truncation == ``//`` truncation and
partial-agg order can't matter), distances are exact BIGINT sums of
squares, and centroid updates are integer-division means. The oracle
unrolls all rounds as CTEs and replays every assignment and every
update, so a single wrong arithmetic step in any round flips the
hash.

Per-round Spark plan (the 100 TB shape):
- assignment is MAP-SIDE ONLY: the K×dim centroid table rides into
  the round as plan literals (K·dim integers — bounded model state,
  the same justification as BPE's per-round argmax), so scoring a
  vector touches no shuffle at all;
- the M-step posexplodes assigned coordinates and relies on partial
  aggregation: each task emits at most K·dim partial rows, so the
  exchange carries O(partitions·K·dim) longs — never O(rows·dim);
- the K·dim update rows come back to the driver to become the next
  round's literals (3 rounds → 3 bounded jobs).

Reference analog: the reference has no clustering; this extends the
engine's curation surface (SemDeDup/IVF cells) with a full-data fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.ann import IVF_FIT_HASH_A, IVF_FIT_HASH_MOD
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

K_CELLS = 8
ROUNDS = 3
DIM = 64
COORD_SCALE = 1_000_000  # micro-ticks
COORD_SHIFT = 100_000_000  # lifts every tick positive; cancels in diffs


def _quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, label, qv): coordinates as positive BIGINT micro-ticks.

    float→double is exact and round() is half-away-from-zero in both
    engines, so the quantization is bit-identical to the oracle's.
    """
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * COORD_SCALE).cast("long")
        + F.lit(COORD_SHIFT),
    )
    return emb.select(
        "vec_id", F.col("label").cast("long").alias("label"), qv.alias("qv")
    )


def _seed_centroids(q: DataFrame, k: int) -> list[list[int]]:
    """Hash-scattered seeds: the k vectors minimizing
    ((vec_id·A) mod M, vec_id) — a TakeOrdered of k rows at any corpus
    size, cell id = position in that order (replayed by the oracle's
    QUALIFY'd row_number)."""
    h = (F.col("vec_id") * F.lit(IVF_FIT_HASH_A)) % F.lit(IVF_FIT_HASH_MOD)
    rows = q.select("vec_id", "qv", h.alias("h")).orderBy("h", "vec_id").limit(k)
    return [list(r.qv) for r in rows.collect()]


def _best_cell(cents: list[list[int]]) -> Column:
    """struct(dist, cell) of the nearest centroid — all-JVM,
    zero-shuffle, and O(1) expression size in K (r7 verdict item 4):
    the whole centroid table rides in as ONE array<array<bigint>>
    Literal (a single Catalyst node carrying K·dim longs of data, not
    K·dim expression nodes), the per-centroid exact integer squared
    distance is a transform/zip_with/aggregate HOF chain, and argmin
    (ties to the lowest cell) is array_min's lexicographic struct
    order. The r7 shape unrolled K separate zip_with expressions —
    fine at K=8, but expression-tree size grew linearly with K, the
    same class as unbounded BPE depth (operators/bpe.py:83). A
    broadcast-join alternative would shuffle O(rows) per round;
    keeping assignment map-side is the 100 TB invariant, so the model
    state stays in the plan — now as data, not as code."""
    d2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(F.col("qv"), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.array_min(
        F.transform(
            F.lit(cents),
            lambda c, j: F.struct(d2(c).alias("dist"), j.cast("long").alias("cell")),
        )
    )


def _update(q: DataFrame, cents: list[list[int]]) -> list[list[int]]:
    """One Lloyd update: assign map-side, then the partial-agg M-step.
    Empty cells keep their previous centroid (mirrored by the oracle's
    COALESCE over a left join). The per-(cell, dim) coordinate sum
    accumulates in DECIMAL(38,0) — a hot cell's BIGINT sum of ~2e8
    ticks cracks int64 around 5e10 members, the r5 OLS overflow class
    — and the floor division happens in Python big-int on the driver
    (sums are positive, so // == floor == DuckDB's HUGEINT //)."""
    asg = q.select(_best_cell(cents)["cell"].alias("cell"), "qv")
    upd = (
        asg.select("cell", F.posexplode("qv").alias("d", "x"))
        .groupBy("cell", "d")
        .agg(
            F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("m"),
        )
        .collect()
    )
    nxt = [list(c) for c in cents]
    for r in upd:
        nxt[r.cell][r.d] = int(r.s) // int(r.m)
    return nxt


def _kmeans_sql(k: int = K_CELLS, rounds: int = ROUNDS) -> str:
    """The unrolled oracle: quantize → seed → (assign, update) ×
    rounds → final assignment audit, every step exact integer math."""
    ctes = [
        f"""q AS (
  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, g.i - 1 AS d,
         CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * {COORD_SCALE}) AS BIGINT)
           + {COORD_SHIFT} AS x
  FROM embeddings e, generate_series(1, {DIM}) AS g(i)
)""",
        f"""seeds AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY (vec_id * {IVF_FIT_HASH_A}) % {IVF_FIT_HASH_MOD}, vec_id
         ) - 1 AS cell
  FROM embeddings
  QUALIFY cell < {k}
)""",
        """c0 AS (
  SELECT s.cell, q.d, q.x FROM seeds s JOIN q ON q.vec_id = s.vec_id
)""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""dist{r} AS (
  SELECT q.vec_id, c.cell, sum((q.x - c.x) * (q.x - c.x)) AS dist
  FROM q JOIN c{r - 1} c ON c.d = q.d
  GROUP BY q.vec_id, c.cell
)"""
        )
        ctes.append(
            f"""asg{r} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM dist{r}) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""upd{r} AS (
  SELECT a.cell, q.d, sum(q.x) // count(*) AS x
  FROM asg{r} a JOIN q ON q.vec_id = a.vec_id
  GROUP BY a.cell, q.d
)"""
        )
        ctes.append(
            f"""c{r} AS (
  SELECT p.cell, p.d, COALESCE(u.x, p.x) AS x
  FROM c{r - 1} p LEFT JOIN upd{r} u ON u.cell = p.cell AND u.d = p.d
)"""
        )
    ctes.append(
        f"""distF AS (
  SELECT q.vec_id, c.cell, sum((q.x - c.x) * (q.x - c.x)) AS dist
  FROM q JOIN c{rounds} c ON c.d = q.d
  GROUP BY q.vec_id, c.cell
)"""
    )
    ctes.append(
        """asgF AS (
  SELECT vec_id, cell, dist FROM (
    SELECT vec_id, cell, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM distF) WHERE rn = 1
)"""
    )
    ctes.append(
        """labels AS (
  SELECT a.cell, CAST(e.label AS BIGINT) AS label, count(*) AS label_n
  FROM asgF a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cell, e.label
)"""
    )
    ctes.append(
        """top AS (
  SELECT cell, label AS top_label, label_n AS top_label_n FROM (
    SELECT cell, label, label_n,
           row_number() OVER (
             PARTITION BY cell ORDER BY label_n DESC, label ASC) AS rn
    FROM labels) WHERE rn = 1
)"""
    )
    joined = ",\n".join(ctes)
    return f"""
    WITH {joined}
    SELECT CAST(a.cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(a.dist AS HUGEINT)) AS HUGEINT) AS VARCHAR)
               AS inertia,
           CAST(any_value(t.top_label) AS BIGINT) AS top_label,
           CAST(any_value(t.top_label_n) AS BIGINT) AS top_label_n
    FROM asgF a JOIN top t ON t.cell = a.cell
    GROUP BY a.cell
    """


@query(
    "ml_kmeans_full_lloyd",
    sql=_kmeans_sql(),
    tags=("ml", "clustering", "vector", "extension", "iterative"),
)
def ml_kmeans_full_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 Lloyd over the full embeddings table, 3 distributed update
    rounds, then a final assignment audit: per cell — member count,
    exact integer inertia, and the majority label (ties to the lowest
    label). Magnitudes: |tick| ≤ 1.006e8, per-dim squared diff ≤
    1.2e12, 64-dim distance ≤ 7.7e13 — so a cell's inertia SUM cracks
    int64 at ~1e5 members, the r5 OLS overflow class. It therefore
    accumulates in DECIMAL(38,0) (Spark decimal128 ≡ DuckDB's HUGEINT
    sum promotion, exact to ~1e24 members) and leaves the query as a
    VARCHAR so the full precision survives the {BIGINT,DOUBLE,VARCHAR}
    output discipline."""
    q = _quantized(load_table(spark, sf_dir, "embeddings"))
    # persist: 3 update rounds + the final audit all rescan this
    q = q.persist()
    try:
        cents = _seed_centroids(q, K_CELLS)
        for _ in range(ROUNDS):
            cents = _update(q, cents)
    finally:
        q.unpersist()
    # rebuild unpersisted lineage for the returned plan so the audit
    # DataFrame owns its full lineage (the driver may execute it after
    # this function returns)
    q2 = _quantized(load_table(spark, sf_dir, "embeddings"))
    best = _best_cell(cents)
    asg = q2.select(
        "vec_id", "label", best["cell"].alias("cell"), best["dist"].alias("dist")
    )
    stats = asg.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # decimal128 accumulation (the r5 OLS overflow fix): a cell's
        # BIGINT inertia sum cracks int64 at ~1e5 members
        F.sum(F.col("dist").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("inertia"),
    )
    lab = asg.groupBy("cell", "label").agg(F.count(F.lit(1)).alias("label_n"))
    w = Window.partitionBy("cell").orderBy(F.desc("label_n"), F.asc("label"))
    top = (
        lab.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("label").alias("top_label"), F.col("label_n").cast("long").alias("top_label_n"))
    )
    return stats.join(F.broadcast(top), "cell").select(
        F.col("cell").cast("long").alias("cell"),
        "n",
        "inertia",
        "top_label",
        "top_label_n",
    )
