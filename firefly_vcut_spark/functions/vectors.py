"""Vector math over ``array<float|double>`` columns — pure Column
expressions (JVM-side, no UDF) so cosine scoring stays inside
whole-stage codegen even at 100 TB fan-out."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; evaluation order matches DuckDB's
    list_cosine_similarity (sequential fold) for hash parity."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, n_bits: int) -> Column:
    """Random-hyperplane-style LSH bucket using the signs of the first
    ``n_bits`` components (axis-aligned hyperplanes — deterministic and
    expressible in both engines)."""
    bits = [
        F.when(F.element_at(a, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)
