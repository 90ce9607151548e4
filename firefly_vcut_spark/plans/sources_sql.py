"""Source-shape queries (SURVEY.md §2.1): the nested transcript type
(S2) and hive-partition-column derivation (S3). The filesystem-level
variants (real partitioned writes + discovery, JSON sinks) are
exercised in tests/test_sources.py where a scratch dir exists."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx


@query(
    "s2_nested_transcript_roundtrip",
    sql=fx.with_fixtures(
        """
    SELECT doc_id, page, seg_idx, start, text FROM segments
    """,
        "segments",
    ),
    tags=("source", "nested"),
)
def s2_nested_transcript_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: the nested transcript type — array (pages) of array
    (segments) of struct{start,text} (transcribe.py:54-63) — built
    from silver rows, then flattened back with double posexplode
    (0-based +1 page numbering, W3). The oracle is the silver fixture
    itself: nest→unnest must be lossless."""
    segs = fx.segments(spark, sf_dir)
    pages = (
        segs.groupBy("doc_id", "page")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("seg_idx", "start", "text"))),
                lambda s: F.struct(s.start.alias("start"), s.text.alias("text")),
            ).alias("segs")
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("page", "segs"))),
                lambda p: p.segs,
            ).alias("transcript")  # array<array<struct<start,text>>>
        )
    )
    return (
        pages.select("doc_id", F.posexplode("transcript").alias("p", "page_segs"))
        .select("doc_id", "p", F.posexplode("page_segs").alias("i", "seg"))
        .select(
            "doc_id",
            (F.col("p") + 1).cast("int").alias("page"),
            F.col("i").cast("int").alias("seg_idx"),
            F.col("seg.start").alias("start"),
            F.col("seg.text").alias("text"),
        )
    )


@query(
    "s3_partition_columns",
    sql=fx.with_fixtures(
        """
    SELECT CAST(year(to_timestamp(pubdate + 28800)) AS BIGINT)  AS year,
           CAST(month(to_timestamp(pubdate + 28800)) AS BIGINT) AS month,
           count(*)                                             AS n_archives,
           CAST(sum(duration) AS BIGINT)                        AS total_duration
    FROM archives
    GROUP BY 1, 2
    """,
        "archives",
    ),
    tags=("source", "partition", "agg"),
)
def s3_partition_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the reference's `<root>/<mid>/<year>/<month>/` directory
    convention (cmdline.py:508-529) as derived partition columns — the
    layout a 100 TB dataset partitions by, enabling partition pruning
    on date predicates. Physical write+discover is tested in
    tests/test_sources.py."""
    a = fx.archives(spark, sf_dir)
    ts = F.timestamp_seconds(F.col("pubdate") + 28800)
    return (
        a.select(
            F.year(ts).cast("long").alias("year"),
            F.month(ts).cast("long").alias("month"),
            "duration",
        )
        .groupBy("year", "month")
        .agg(
            F.count(F.lit(1)).alias("n_archives"),
            F.sum("duration").cast("long").alias("total_duration"),
        )
    )
