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


def prune_files_for_probe(
    stats,
    ub_range: tuple[int, int] | None = None,
    vb_range: tuple[int, int] | None = None,
) -> list[int]:
    """Reader-side pruning: given the collected per-file stats rows
    (the layout audit, standing in for parquet footer min/max), return
    the file_ids whose rectangle intersects the probe ranges. At scale
    this is what the scan planner does with footer stats; here it
    drives partition pruning on the ``file_id`` write column."""
    keep = []
    for r in stats:
        if ub_range and (r.max_ub < ub_range[0] or r.min_ub > ub_range[1]):
            continue
        if vb_range and (r.max_vb < vb_range[0] or r.min_vb > vb_range[1]):
            continue
        keep.append(r.file_id)
    return keep


def zorder_assign(events: DataFrame, bits: int = 8, file_bits: int = 5) -> DataFrame:
    """The write-side projection: events + (ub, vb, z, file_id) columns,
    ready for ``repartition(file_id).sortWithinPartitions(z)
    .write.partitionBy(file_id)``."""
    hi = (1 << bits) - 1
    ub = F.pmod(F.col("user_id"), F.lit(1 << bits)).cast("int")
    vb = F.least(F.floor(F.col("value") / 2).cast("int"), F.lit(hi))
    z = zvalue(ub, vb, bits)
    return (
        events.withColumn("ub", ub.cast("long"))
        .withColumn("vb", vb.cast("long"))
        .withColumn("z", z.cast("long"))
        .withColumn("file_id", F.shiftright(z, 2 * bits - file_bits).cast("long"))
    )


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
    return (
        zorder_assign(events, bits, file_bits)
        .select("file_id", "ub", "vb")
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ub").alias("min_ub"),
            F.max("ub").alias("max_ub"),
            F.min("vb").alias("min_vb"),
            F.max("vb").alias("max_vb"),
        )
    )
