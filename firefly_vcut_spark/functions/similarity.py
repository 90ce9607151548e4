"""Text-similarity scoring functions (reference F3/U2:
``rapidfuzz.fuzz.ratio`` at fuzz.py:26,36 — normalized indel
similarity in [0, 100]).

Two implementations, used by the fuzzy scan operator:

- ``levenshtein_sum_ratio`` — pure-Column, JVM-side, whole-stage
  codegen'd: ``100·(1 − lev(a,b)/(|a|+|b|))``. Not identical to indel
  similarity (levenshtein allows substitutions at cost 1; indel
  charges 2), but shares the same DuckDB-expressible definition, so
  it is the scoring used by every oracle-checked query. Bounds:
  lev ≤ indel ≤ 2·lev, hence levenshtein_sum_ratio ≥ indel_ratio.
- ``indel_ratio_udf`` — exact rapidfuzz semantics
  ``100·(1 − indel(a,b)/(|a|+|b|)) = 200·LCS(a,b)/(|a|+|b|)`` as an
  Arrow-batched pandas UDF over a bit-parallel LCS (Allison–Dix
  bit-vector recurrence, O(⌈|a|/64⌉·|b|) per pair via Python
  bigints). Engine-exact path; not SQL-expressible, so covered by
  property tests against a straight DP instead of the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def levenshtein_sum_ratio(a: Column, b: Column) -> Column:
    """100·(1 − levenshtein/(|a|+|b|)), clamped denominator ≥ 1."""
    denom = F.greatest(F.length(a) + F.length(b), F.lit(1))
    return 100.0 * (1.0 - F.levenshtein(a, b) / denom)


from functools import lru_cache


@lru_cache(maxsize=8192)
def _char_masks(a: str) -> dict[str, int]:
    """Position bitmasks of each character of ``a``. Cached: in the
    fuzzy scan one lyrics string scores against thousands of windows,
    so the mask table amortizes to once per distinct needle."""
    masks: dict[str, int] = {}
    bit = 1
    for ch in a:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def lcs_length(a: str, b: str) -> int:
    """Longest-common-subsequence length, bit-parallel.

    Allison–Dix bit-vector recurrence: one bigint row; each set bit
    after processing b marks a match contributing to the LCS.
    """
    if not a or not b:
        return 0
    masks = _char_masks(a)
    row = 0
    for ch in b:
        x = row | masks.get(ch, 0)
        row = x & ~(x - ((row << 1) | 1))
    return row.bit_count()


def indel_ratio(a: str | None, b: str | None) -> float:
    """Exact normalized indel similarity in [0, 100]."""
    if a is None or b is None:
        return 0.0
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    return 200.0 * lcs_length(a, b) / (la + lb)


@F.pandas_udf(DoubleType())
def indel_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [indel_ratio(x, y) for x, y in zip(a, b)], dtype="float64"
    )
