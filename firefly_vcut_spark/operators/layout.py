"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

The 100 TB problem this solves: a table queried by TWO independent
dimensions (here events.user_id and events.value) can only be
range-partitioned by one of them — probes on the other dimension touch
every file. Interleaving the bits of both dimensions into one Morton
z-value and laying files out along that curve gives every file a small
RECTANGLE of the (dim1, dim2) space, so parquet footer min/max stats
prune files for probes on either dimension (the Delta/Iceberg OPTIMIZE
ZORDER recipe).

Everything is pure integer Column arithmetic (shift/and/or — inside
whole-stage codegen, no UDF), and the file assignment is the TOP BITS
of the z-value — a map-side bucket, NOT a total sort: at scale the
write is ``repartition(file_id).sortWithinPartitions(z)`` and the
min/max per file land in parquet footers for free. A DuckDB oracle
replays the interleave bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Pure shift/and/sum — stays in codegen."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zvalue_sql(a: str, b: str, bits: int = 8) -> str:
    """The identical interleave as portable SQL (DuckDB/ANSI bit ops)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_file_stats(
    events: DataFrame,
    bits: int = 8,
    file_bits: int = 5,
) -> DataFrame:
    """Assign each event to a z-order file (top ``file_bits`` bits of
    the 2·``bits``-bit z-value) and report per-file row counts and
    per-dimension min/max — the footer stats a reader would prune on.

    Dimension buckets: user_id mod 2^bits (hash-stable at any user
    count) and value/2 clamped to 2^bits-1 (range-stable). One
    map-side projection + one groupBy shuffle on file_id; no sort."""
    hi = (1 << bits) - 1
    ub = F.pmod(F.col("user_id"), F.lit(1 << bits)).cast("int")
    vb = F.least(F.floor(F.col("value") / 2).cast("int"), F.lit(hi))
    z = zvalue(ub, vb, bits)
    file_id = F.shiftright(z, 2 * bits - file_bits)
    return (
        events.select(
            file_id.cast("long").alias("file_id"),
            ub.cast("long").alias("ub"),
            vb.cast("long").alias("vb"),
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ub").alias("min_ub"),
            F.max("ub").alias("max_ub"),
            F.min("vb").alias("min_vb"),
            F.max("vb").alias("max_vb"),
        )
    )
