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

from firefly_vcut_spark.operators.layout import zorder_file_stats, zvalue_sql
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
