"""Distributed dense linear algebra over embedding columns: the Gram
matrix (X^T X), the building block for PCA / covariance / linear
probes / whitening at corpus scale.

The 100 TB shape: each partition reduces its rows to ONE d×d partial
matrix map-side (Arrow-batched numpy — O(rows·d²) flops, zero
shuffle), and only the tiny partials (d² entries per partition)
shuffle into the final sum. With d=64 a partial is 32 KB — a
1000-executor cluster shuffles megabytes to reduce 100 TB of vectors.

Entries are quantized to 1e-9 with FLOOR (floor is exactly
deterministic on IEEE doubles — no round-half ties) and summed as
INTEGERS, so partition count and ordering cannot move the result and
a DuckDB oracle replays the sum bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1_000_000_000  # 1e-9 quantization of per-pair products


def power_iteration_quantized(
    gram: dict[tuple[int, int], float], d: int, squarings: int = 7
) -> list[float]:
    """Deterministic top-eigenvector estimate by repeated MATRIX
    SQUARING (M → M², ``squarings`` times ≡ 2^squarings power-iteration
    steps — needed because the synthetic spectrum is nearly flat,
    λ1/λ2 ≈ 1.07) with every intermediate quantized so an independent
    engine can replay it exactly: the matrix is max-normalized with a
    FLOOR at 1e-6 before and after each squaring (floor on IEEE
    doubles has no round-half ties), and each squared entry is an
    INTEGER sum of per-term floors. The eigvec estimate is column 1 of
    M^(2^s). ``gram`` maps (i, j) 1-based upper-triangle entries."""
    import math

    def g(i: int, j: int) -> float:
        return gram[(i, j)] if i <= j else gram[(j, i)]

    mx0 = max(abs(g(i, j)) for i in range(1, d + 1) for j in range(1, d + 1))
    M = [
        [math.floor(g(i, j) * 1_000_000 / mx0) / 1_000_000 for j in range(1, d + 1)]
        for i in range(1, d + 1)
    ]
    for _ in range(squarings):
        P = [
            [
                sum(
                    int(math.floor(M[i][k] * M[k][j] * 1_000_000))
                    for k in range(d)
                )
                for j in range(d)
            ]
            for i in range(d)
        ]
        m = max(abs(v) for row in P for v in row)
        if m == 0:
            break
        M = [
            [math.floor(v * 1_000_000 / m) / 1_000_000 for v in row] for row in P
        ]
    return [M[i][0] for i in range(d)]


def gram_matrix(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Upper-triangle Gram matrix of the embedding column:
    rows (i, j, gram) for 1 <= i <= j <= d, where
    gram = round(sum_rows(floor(v[i]·v[j]·1e9)) / 1e9, round_to)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # per-row outer products, quantized THEN summed so the
            # partial is an exact integer matrix
            q = np.floor(
                (V[:, :, None] * V[:, None, :]) * _Q
            ).astype(np.int64)
            part = q.sum(axis=0)
            acc = part if acc is None else acc + part
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = [], []
        for i in range(d):
            for j in range(i, d):
                iu.append(i + 1)
                ju.append(j + 1)
        yield pd.DataFrame(
            {
                "i": iu,
                "j": ju,
                "part": [int(acc[i - 1, j - 1]) for i, j in zip(iu, ju)],
            }
        )

    partials = embeddings.select(
        F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(kernel, "i long, j long, part long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("part").alias("qsum"))
        .select(
            "i",
            "j",
            F.round(F.col("qsum") / F.lit(float(_Q)), round_to).alias("gram"),
        )
    )
