"""Bloom-filter semi-join reduction, as pure DataFrame ops.

The classic 100 TB join pattern: when a selective dimension subset
joins a huge fact, build a Bloom filter over the dim keys (one small
aggregation), broadcast it, and drop non-candidate fact rows AT THE
SCAN — before the fact ever enters the join shuffle. The exact join
that follows removes Bloom false positives, so the final result is
bit-identical to the plain join; the filter is purely a shuffle-volume
optimization (Spark's own runtime bloomFilter rewrite does the same
under AQE — this is the explicit, plannable form).

Everything is JVM Column math: k positions per key via seed-chained
``xxhash64``, the bitmap built with a ``bit_or`` aggregation grouped by
64-bit word index, densified against ``spark.range(n_words)``, and
collapsed to ONE row holding an ``array<long>`` — ~m/8 bytes, e.g.
128 KB for 1M bits — which broadcasts to every executor as a 1-row
cross join. No driver-side ``collect``, no Python in the hot path.

Reference analog: the reference prunes its fact scans with driver-side
memo sets (``sync_occurrences`` skips (bvid, song) pairs already
scanned — src/firefly_vcut/cmdline.py:300-357); a Bloom filter is the
same reduction made cluster-shaped.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, i), m)."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 13, k: int = 3
) -> DataFrame:
    """Aggregate the build side's keys into a 1-row Bloom bitmap.

    Returns a single-row DataFrame ``{bloom_words: array<long>}`` of
    length ``m_bits / 64``. Distributed end-to-end: explode k
    positions per key, bit_or per word, densify missing words to 0
    against ``range(n_words)``, assemble the array in word order.
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    spark = keys.sparkSession
    bits = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    )
    words = (
        bits.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    dense = (
        spark.range(n_words)
        .withColumnRenamed("id", "w")
        .join(words, "w", "left")
        .select("w", F.coalesce(F.col("word"), F.lit(0).cast("long")).alias("word"))
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda s: s["word"],
        ).alias("bloom_words")
    )


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 13,
    k: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key might be in the Bloom filter.

    Broadcasts the 1-row bitmap (BroadcastNestedLoopJoin against a
    single row is a free fan-out) and tests all k bits scan-side, so
    the reduction happens before any fact shuffle. Guaranteed no false
    negatives; false positives are removed by the exact join the
    caller runs next.
    """
    with_words = fact.crossJoin(F.broadcast(bloom))
    checks = []
    for i, pos in enumerate(_positions(F.col(key_col), m_bits, k)):
        p = f"_bloom_pos_{i}"
        with_words = with_words.withColumn(p, pos)
        bit = F.expr(
            f"shiftrightunsigned(element_at(bloom_words, "
            f"cast({p} / 64 AS int) + 1), cast({p} % 64 AS int)) & 1"
        )
        checks.append(bit == 1)
    kept = with_words.filter(reduce(lambda a, b: a & b, checks))
    drop = ["bloom_words"] + [f"_bloom_pos_{i}" for i in range(k)]
    return kept.drop(*drop)
