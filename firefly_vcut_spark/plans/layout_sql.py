"""Data-layout optimization queries: z-order (Morton) file clustering.

The write-side half of the 100 TB story: `operators/layout.py` computes
the Morton-curve file assignment that a `repartition(file_id)
.sortWithinPartitions(z)` write would use; the query here reports the
per-file min/max footer stats a reader prunes on, and the pytest gate
(`tests/test_layout.py`) asserts the rectangles are actually narrow —
i.e. a probe on EITHER dimension touches few files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.layout import zorder_file_stats, zvalue, zvalue_sql
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table


def _zorder_sql(bits: int = 8, file_bits: int = 5) -> str:
    hi = (1 << bits) - 1
    z = zvalue_sql("ub", "vb", bits)
    return f"""
    WITH dims AS (
      SELECT (user_id % {1 << bits}) AS ub,
             least(CAST(floor(value / 2) AS INTEGER), {hi}) AS vb
      FROM events
    ),
    zed AS (SELECT ub, vb, ({z}) AS z FROM dims)
    SELECT CAST(z >> {2 * bits - file_bits} AS BIGINT) AS file_id,
           count(*) AS n_rows,
           CAST(min(ub) AS BIGINT) AS min_ub,
           CAST(max(ub) AS BIGINT) AS max_ub,
           CAST(min(vb) AS BIGINT) AS min_vb,
           CAST(max(vb) AS BIGINT) AS max_vb
    FROM zed GROUP BY 1
    """


@query(
    "layout_zorder_files",
    sql=_zorder_sql(),
    tags=("layout", "extension", "scale"),
)
def layout_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over events: Morton-interleave
    (user_id mod 256, value/2 clamped 0..255), file = top 5 z bits
    (32 files), per-file min/max of both dimensions. Map-side bucket +
    ONE groupBy shuffle — no total sort; the oracle replays the
    interleave bit-for-bit in SQL."""
    return zorder_file_stats(load_table(spark, sf_dir, "events"))


# pruning-compare probes: a 16-wide user band and a 20-wide value band
_UB_LO, _UB_HI = 64, 79
_VB_LO, _VB_HI = 100, 119


def _pruning_compare_sql(bits: int = 8, file_bits: int = 5) -> str:
    hi = (1 << bits) - 1
    z = zvalue_sql("ub", "vb", bits)
    return f"""
    WITH dims AS (
      SELECT event_id, (user_id % {1 << bits}) AS ub,
             least(CAST(floor(value / 2) AS INTEGER), {hi}) AS vb
      FROM events
    ),
    assigned AS (
      SELECT 'zorder' AS layout,
             CAST(({z}) >> {2 * bits - file_bits} AS BIGINT) AS file_id,
             ub, vb FROM dims
      UNION ALL
      SELECT 'linear_ub', CAST(ub >> {bits - file_bits} AS BIGINT), ub, vb
      FROM dims
      UNION ALL
      SELECT 'unclustered', CAST(event_id % {1 << file_bits} AS BIGINT),
             ub, vb
      FROM dims
    ),
    stats AS (
      SELECT layout, file_id, count(*) AS n_rows,
             min(ub) AS min_ub, max(ub) AS max_ub,
             min(vb) AS min_vb, max(vb) AS max_vb
      FROM assigned GROUP BY 1, 2
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN max_ub >= {_UB_LO} AND min_ub <= {_UB_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS ub_files,
           CAST(sum(CASE WHEN max_ub >= {_UB_LO} AND min_ub <= {_UB_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS ub_rows,
           CAST(sum(CASE WHEN max_vb >= {_VB_LO} AND min_vb <= {_VB_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS vb_files,
           CAST(sum(CASE WHEN max_vb >= {_VB_LO} AND min_vb <= {_VB_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS vb_rows
    FROM stats GROUP BY layout
    """


@query(
    "layout_pruning_compare",
    sql=_pruning_compare_sql(),
    tags=("layout", "extension", "scale"),
)
def layout_pruning_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number that justifies z-order at 100 TB: for the SAME events
    table laid out three ways — z-order (top 5 Morton bits), linear on
    ub only (top 5 ub bits), and unclustered (event_id mod 32) — report
    how many files and rows a min/max-pruned reader scans for a probe
    band on EITHER dimension. Expected shape: linear is perfect on ub
    but scans everything on vb; unclustered scans everything on both;
    z-order scans a small fraction on both.

    Scale shape: ONE scan of events (the three assignments are an
    inline explode of (layout, file_id) structs — map-side, no re-read),
    one partial-agg shuffle whose state is O(layouts x files) = 96
    groups, then a 96-row rollup. No sort, no text, no UDF — the same
    audit runs unchanged over 100 TB because only footer-stat-sized
    rows ever shuffle."""
    bits, file_bits = 8, 5
    hi = (1 << bits) - 1
    d = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ub = F.pmod(F.col("user_id"), F.lit(1 << bits)).cast("int")
    vb = F.least(F.floor(F.col("value") / 2).cast("int"), F.lit(hi))
    dims = d.select(
        F.col("event_id"), ub.alias("ub"), vb.alias("vb")
    )
    z = zvalue(F.col("ub"), F.col("vb"), bits)
    assigned = dims.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(z, 2 * bits - file_bits).cast("long").alias("file_id"),
                ),
                F.struct(
                    F.lit("linear_ub").alias("layout"),
                    F.shiftright(F.col("ub"), bits - file_bits)
                    .cast("long")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("unclustered").alias("layout"),
                    F.pmod(F.col("event_id"), F.lit(1 << file_bits))
                    .cast("long")
                    .alias("file_id"),
                ),
            )
        ).alias("a"),
        F.col("ub"),
        F.col("vb"),
    ).select(F.col("a.layout").alias("layout"), F.col("a.file_id").alias("file_id"), "ub", "vb")
    stats = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ub").alias("min_ub"),
        F.max("ub").alias("max_ub"),
        F.min("vb").alias("min_vb"),
        F.max("vb").alias("max_vb"),
    )
    ub_hit = (F.col("max_ub") >= _UB_LO) & (F.col("min_ub") <= _UB_HI)
    vb_hit = (F.col("max_vb") >= _VB_LO) & (F.col("min_vb") <= _VB_HI)
    one = F.lit(1)
    return stats.groupBy("layout").agg(
        F.count(one).cast("long").alias("n_files"),
        F.sum(F.when(ub_hit, one).otherwise(F.lit(0))).cast("long").alias("ub_files"),
        F.sum(F.when(ub_hit, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("ub_rows"),
        F.sum(F.when(vb_hit, one).otherwise(F.lit(0))).cast("long").alias("vb_files"),
        F.sum(F.when(vb_hit, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("vb_rows"),
    )
