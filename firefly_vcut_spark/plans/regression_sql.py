"""Closed-form linear regression (OLS via normal equations) as a
hash-checked distributed job: the moment matrix X^T X and X^T y
accumulate as EXACT DECIMAL(38,0) sums in one scan-shaped aggregate
(decimal128 ≡ DuckDB's HUGEINT sum promotion; plain BIGINT sums were
caught overflowing by the sf1 spot gate — per-row products fit int64,
their sums do not at scale), the 3×3 system solves by exact-integer
Cramer determinants (Python big-int on the driver ≡ HUGEINT in the
oracle), and a second scan scores R² from floor-quantized
predictions. Headroom note: the Cramer determinant terms grow as
n·Σx²·Σx'² ≈ 5e27 at sf1 and ~5e36 at the 1000x mark — inside
decimal128/HUGEINT, which is why the solve stays exact where a
float path would have quietly lost the low bits long before.

This is the third hash-checkable ML recipe in the repo (after the
PCA matrix squaring and the Lloyd/IVF fit): iterative-free this time
— closed form means the ONLY driver step is a 3×3 determinant.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

# integer feature encoding: x1 = quantity (already integral),
# x2 = discount in % ticks, y = extended price in cents
_X1 = "CAST(l_quantity AS BIGINT)"
_X2 = "CAST(round(l_discount * 100) AS BIGINT)"
_Y = "CAST(round(l_extendedprice * 100) AS BIGINT)"


def _det3(m: list[list[int]]) -> int:
    """Exact 3×3 determinant over Python big ints."""
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _sql_det3(m: list[list[str]]) -> str:
    """The same determinant over HUGEINT-cast SQL expressions."""
    h = [[f"CAST({e} AS HUGEINT)" for e in row] for row in m]
    return (
        f"({h[0][0]} * ({h[1][1]} * {h[2][2]} - {h[1][2]} * {h[2][1]})"
        f" - {h[0][1]} * ({h[1][0]} * {h[2][2]} - {h[1][2]} * {h[2][0]})"
        f" + {h[0][2]} * ({h[1][0]} * {h[2][1]} - {h[1][1]} * {h[2][0]}))"
    )


def _ols_sql() -> str:
    a = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    cols = {"0": ["sy", "s1y", "s2y"]}
    rep = lambda i: [
        [cols["0"][r] if c == i else a[r][c] for c in range(3)]
        for r in range(3)
    ]
    det = _sql_det3(a)
    det0, det1, det2 = (_sql_det3(rep(i)) for i in range(3))
    # floor-quantize betas (floor has no round-half ties, unlike round)
    beta = lambda d: f"floor(CAST({d} AS DOUBLE) / CAST({det} AS DOUBLE) * 10000) / 10000"
    return f"""
    WITH enc AS (
      SELECT {_X1} AS x1, {_X2} AS x2, {_Y} AS y FROM lineitem
    ),
    mom AS (
      SELECT count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM enc
    ),
    beta AS (
      SELECT n, sy,
             {beta(det0)} AS b0, {beta(det1)} AS b1, {beta(det2)} AS b2
      FROM mom
    ),
    scored AS (
      SELECT e.y,
             CAST(floor(b.b0 + b.b1 * e.x1 + b.b2 * e.x2) AS BIGINT)
               AS yhat,
             CAST(b.sy // b.n AS BIGINT) AS ybar,
             b.b0, b.b1, b.b2, b.n
      FROM enc e CROSS JOIN beta b
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           max(b0) AS beta0, max(b1) AS beta1, max(b2) AS beta2,
           round(1.0 - CAST(sum((y - yhat) * (y - yhat)) AS DOUBLE)
                       / CAST(sum((y - ybar) * (y - ybar)) AS DOUBLE),
                 4) AS r2
    FROM scored
    """


@query(
    "agg_ols_regression",
    sql=_ols_sql(),
    tags=("agg", "ml", "linalg", "extension"),
)
def agg_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of extended price (cents) on (1, quantity,
    discount-ticks) over the whole lineitem table, closed form:
    integer moment sums → exact-integer Cramer solve (driver big-int;
    the oracle repeats it in HUGEINT) → R² from floor-quantized
    predictions in a second scan. Coefficients and fit quality are
    hash-pinned, which no float-accumulating regression can offer.

    Scale: pass 1 is a scan-shaped aggregate to NINE integers — the
    d=3 corner of the Gram-matrix reduce (megabytes of partials at
    100 TB); the solve is O(1) on the driver; pass 2 is another pure
    scan with the betas as literals."""
    li = load_table(spark, sf_dir, "lineitem")
    enc = li.select(
        F.expr(_X1).alias("x1"), F.expr(_X2).alias("x2"), F.expr(_Y).alias("y")
    )
    # moment sums accumulate in DECIMAL(38,0) (Spark decimal128 ≡
    # DuckDB's HUGEINT sum promotion): per-row products fit BIGINT
    # easily, but their SUMS crack int64 with scale — the sf1 gate
    # caught sum((y-ŷ)²) overflowing at 6M rows, and sum(x1·y)
    # (~3e15 at sf1) would follow around the 1000x mark
    dec = lambda c: c.cast("decimal(38,0)")
    mom = enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).alias("s1"),
        F.sum(dec(F.col("x2"))).alias("s2"),
        F.sum(dec(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(dec(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(dec(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x1") * F.col("y"))).alias("s1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).alias("s2y"),
    ).collect()[0]
    n, s1, s2 = int(mom["n"]), int(mom["s1"]), int(mom["s2"])
    s11, s12, s22 = int(mom["s11"]), int(mom["s12"]), int(mom["s22"])
    sy, s1y, s2y = int(mom["sy"]), int(mom["s1y"]), int(mom["s2y"])
    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    b = [sy, s1y, s2y]
    det = _det3(A)
    betas = []
    for i in range(3):
        Ai = [[b[r] if c == i else A[r][c] for c in range(3)] for r in range(3)]
        # same floor-quantization as the oracle (no round-half ties)
        betas.append(math.floor(float(_det3(Ai)) / float(det) * 10000) / 10000)
    b0, b1, b2 = betas
    ybar = sy // n
    scored = enc.select(
        "y",
        F.floor(
            F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
        )
        .cast("long")
        .alias("yhat"),
    )
    dsq = lambda c: (c * c).cast("decimal(38,0)")
    return scored.agg(
        F.lit(n).cast("long").alias("n"),
        F.lit(b0).alias("beta0"),
        F.lit(b1).alias("beta1"),
        F.lit(b2).alias("beta2"),
        F.round(
            F.lit(1.0)
            - F.sum(dsq(F.col("y") - F.col("yhat"))).cast("double")
            / F.sum(dsq(F.col("y") - F.lit(ybar))).cast("double"),
            4,
        ).alias("r2"),
    )


def _dec(e: str) -> str:
    return f"CAST({e} AS DECIMAL(38, 0))"


def _grouped_ols_sql() -> str:
    a = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    b = ["sy", "s1y", "s2y"]
    rep = lambda i: [
        [b[r] if c == i else a[r][c] for c in range(3)] for r in range(3)
    ]
    det = _sql_det3(a)
    det0, det1, det2 = (_sql_det3(rep(i)) for i in range(3))
    beta = (
        lambda d: f"floor(CAST({d} AS DOUBLE) / CAST({det} AS DOUBLE)"
        " * 10000) / 10000"
    )
    return f"""
    WITH enc AS (
      SELECT c.c_mktsegment AS seg,
             {_X1} AS x1, {_X2} AS x2, {_Y} AS y
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    mom AS (
      SELECT seg, count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM enc GROUP BY seg
    ),
    beta AS (
      SELECT seg, n, sy,
             {beta(det0)} AS b0, {beta(det1)} AS b1, {beta(det2)} AS b2
      FROM mom
    ),
    scored AS (
      SELECT e.seg, e.y,
             CAST(floor(b.b0 + b.b1 * e.x1 + b.b2 * e.x2) AS BIGINT) AS yhat,
             CAST(b.sy // b.n AS BIGINT) AS ybar
      FROM enc e JOIN beta b ON b.seg = e.seg
    )
    SELECT b.seg AS segment,
           CAST(b.n AS BIGINT) AS n,
           b.b0 AS beta0, b.b1 AS beta1, b.b2 AS beta2,
           round(1.0 - CAST(sum((s.y - s.yhat) * (s.y - s.yhat)) AS DOUBLE)
                       / CAST(sum((s.y - s.ybar) * (s.y - s.ybar)) AS DOUBLE),
                 4) AS r2
    FROM scored s JOIN beta b ON b.seg = s.seg
    GROUP BY b.seg, b.n, b.b0, b.b1, b.b2
    """


@query(
    "agg_grouped_ols_by_segment",
    sql=_grouped_ols_sql(),
    tags=("agg", "ml", "linalg", "extension"),
)
def agg_grouped_ols_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS with NO driver solve: one regression per market
    segment, the 3×3 Cramer determinants computed as DECIMAL(38,0)
    Column arithmetic on the per-group integer moments (Spark's
    decimal128 ≡ the oracle's HUGEINT — values bounded ~1e30, far
    inside 38 digits). This is grouped model fitting as a pure
    aggregation pipeline: thousands of per-key models would fit in
    the same two passes, which the driver-solve variant
    (agg_ols_regression) cannot do.

    Scale: pass 1 = one groupBy to 9 integers per segment (map-side
    combinable); the beta table is O(groups) and BROADCASTS back for
    the R² scan; no collect anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    enc = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.expr(_X1).alias("x1"),
            F.expr(_X2).alias("x2"),
            F.expr(_Y).alias("y"),
        )
    )
    # DECIMAL(38,0) accumulation — same overflow headroom note as
    # agg_ols_regression (the sf1 spot gate caught the int64 sums)
    dec = lambda c: c.cast("decimal(38,0)")
    mom = enc.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).alias("s1"),
        F.sum(dec(F.col("x2"))).alias("s2"),
        F.sum(dec(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(dec(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(dec(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x1") * F.col("y"))).alias("s1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).alias("s2y"),
    )

    def d(name: str):
        return F.col(name).cast("decimal(38,0)")

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    A = [[d("n"), d("s1"), d("s2")], [d("s1"), d("s11"), d("s12")], [d("s2"), d("s12"), d("s22")]]
    bv = [d("sy"), d("s1y"), d("s2y")]
    det = det3(A)

    def beta_col(i: int):
        Ai = [[bv[r] if cc == i else A[r][cc] for cc in range(3)] for r in range(3)]
        return F.floor(
            det3(Ai).cast("double") / det.cast("double") * 10000
        ) / 10000

    betas = mom.select(
        "seg",
        F.col("n").cast("long").alias("n"),
        F.col("sy"),
        beta_col(0).alias("b0"),
        beta_col(1).alias("b1"),
        beta_col(2).alias("b2"),
        # exact floor division on the decimal sum: `div` would funnel
        # through long (silent wraparound past 2^63), and a plain
        # decimal divide rounds HALF_UP at the result scale — make
        # the quotient an integer first, then division is exact
        F.expr("CAST((sy - (sy % n)) / n AS DECIMAL(38,0))")
        .cast("long")
        .alias("ybar"),
    )
    scored = enc.join(F.broadcast(betas), "seg").select(
        "seg",
        "n",
        "b0",
        "b1",
        "b2",
        "y",
        F.floor(
            F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2")
        )
        .cast("long")
        .alias("yhat"),
        "ybar",
    )
    dsq = lambda c: (c * c).cast("decimal(38,0)")
    return (
        scored.groupBy("seg", "n", "b0", "b1", "b2")
        .agg(
            F.round(
                F.lit(1.0)
                - F.sum(dsq(F.col("y") - F.col("yhat"))).cast("double")
                / F.sum(dsq(F.col("y") - F.col("ybar"))).cast("double"),
                4,
            ).alias("r2")
        )
        .select(
            F.col("seg").alias("segment"),
            "n",
            F.col("b0").alias("beta0"),
            F.col("b1").alias("beta1"),
            F.col("b2").alias("beta2"),
            "r2",
        )
    )
