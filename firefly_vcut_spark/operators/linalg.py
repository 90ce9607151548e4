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
