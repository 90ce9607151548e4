"""Scalar-function queries (SURVEY.md §2.8) — each function exercised
over a fixture/synthetic table with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.functions import scalar as fn
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx
from firefly_vcut_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# F1 — regex datetime extraction; non-matching rows dropped
# ---------------------------------------------------------------------------

_TITLE_RE_SQL = r"(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场"


@query(
    "f1_regex_title_date",
    sql=fx.with_fixtures(
        f"""
    SELECT id,
           CAST(regexp_extract(title, '{_TITLE_RE_SQL}', 1) AS BIGINT) AS y,
           CAST(regexp_extract(title, '{_TITLE_RE_SQL}', 2) AS BIGINT) AS m,
           CAST(regexp_extract(title, '{_TITLE_RE_SQL}', 3) AS BIGINT) AS d,
           CAST(regexp_extract(title, '{_TITLE_RE_SQL}', 4) AS BIGINT) AS h
    FROM archives
    WHERE regexp_extract(title, '{_TITLE_RE_SQL}', 0) <> ''
    """,
        "archives",
    ),
    tags=("function", "regex", "filter"),
)
def f1_regex_title_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: extract the 《YYYY年M月D日H点场》 recording date from titles;
    rows without the pattern are dropped — it's a filter+project, not a
    null-producing projection (db/recording.py:22-33,62)."""
    a = fx.archives(spark, sf_dir)
    t = F.col("title")
    return a.filter(fn.title_has_date(t)).select(
        "id",
        fn.title_date_part(t, 1).alias("y"),
        fn.title_date_part(t, 2).alias("m"),
        fn.title_date_part(t, 3).alias("d"),
        fn.title_date_part(t, 4).alias("h"),
    )


# ---------------------------------------------------------------------------
# F2 — ordered multi-pattern bracket extraction, first match wins
# ---------------------------------------------------------------------------


@query(
    "f2_bracket_title_extract",
    sql="""
    WITH titled AS (
        SELECT doc_id,
               CASE doc_id % 4
                   WHEN 0 THEN '歌回《song-' || CAST(doc_id AS VARCHAR) || '》高光'
                   WHEN 1 THEN '剪辑『song-' || CAST(doc_id AS VARCHAR) || '』片段'
                   WHEN 2 THEN '回放「song-' || CAST(doc_id AS VARCHAR) || '」存档'
                   ELSE 'plain title ' || CAST(doc_id AS VARCHAR)
               END AS video_title
        FROM documents
    )
    SELECT doc_id,
           coalesce(
               nullif(regexp_extract(video_title, '《(.*)》', 1), ''),
               nullif(regexp_extract(video_title, '『(.*)』', 1), ''),
               nullif(regexp_extract(video_title, '「(.*)」', 1), '')
           ) AS extracted
    FROM titled
    """,
    tags=("function", "regex"),
)
def f2_bracket_title_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: try 《..》, 『..』, 「..」 in order, first match wins; no
    match → NULL (modal/video.py:14-18 tries patterns sequentially;
    coalesce preserves the order)."""
    d = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    titled = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("歌回《song-"), sid, F.lit("》高光")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("剪辑『song-"), sid, F.lit("』片段")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("回放「song-"), sid, F.lit("」存档")))
        .otherwise(F.concat(F.lit("plain title "), sid))
        .alias("video_title"),
    )
    return titled.select("doc_id", fn.extract_bracketed_title(F.col("video_title")).alias("extracted"))


# ---------------------------------------------------------------------------
# F5 — seconds → hh:mm:ss
# ---------------------------------------------------------------------------


@query(
    "f5_seconds_hhmmss",
    sql=fx.with_fixtures(
        """
    SELECT id,
           printf('%02d:%02d:%02d', duration // 3600, (duration % 3600) // 60, duration % 60)
               AS clock
    FROM archives WHERE id % 9 = 0
    """,
        "archives",
    ),
    tags=("function",),
)
def f5_seconds_hhmmss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: zero-padded hh:mm:ss clock strings (cmdline.py:549-568)."""
    a = fx.archives(spark, sf_dir).filter(F.col("id") % 9 == 0)
    return a.select("id", fn.seconds_to_hhmmss(F.col("duration")).alias("clock"))


# ---------------------------------------------------------------------------
# F6/F7 — epoch → Asia/Shanghai parts + strftime-style dir name
# ---------------------------------------------------------------------------


@query(
    "f6_epoch_shanghai_parts",
    sql=fx.with_fixtures(
        """
    SELECT id,
           CAST(year(to_timestamp(pubdate + 28800)) AS BIGINT)       AS y,
           CAST(month(to_timestamp(pubdate + 28800)) AS BIGINT)      AS m,
           CAST(day(to_timestamp(pubdate + 28800)) AS BIGINT)        AS d,
           strftime(to_timestamp(pubdate + 28800), '%Y-%m-%d_%H-%M-%S') AS dir_name
    FROM archives WHERE id % 11 = 0
    """,
        "archives",
    ),
    tags=("function", "datetime"),
)
def f6_epoch_shanghai_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+F7: epoch pubdate → Asia/Shanghai (fixed UTC+8) date parts
    and the `%Y-%m-%d_%H-%M-%S` directory name (cmdline.py:436-441;
    modal/stream.py:336-341)."""
    a = fx.archives(spark, sf_dir).filter(F.col("id") % 11 == 0)
    ts = fn.epoch_to_shanghai_ts(F.col("pubdate"))
    return a.select(
        "id",
        F.year(ts).cast("long").alias("y"),
        F.month(ts).cast("long").alias("m"),
        F.dayofmonth(ts).cast("long").alias("d"),
        F.date_format(ts, "yyyy-MM-dd_HH-mm-ss").alias("dir_name"),
    )


# ---------------------------------------------------------------------------
# F8 — partition-path construction (the reference's hive-style key scheme)
# ---------------------------------------------------------------------------


@query(
    "f8_partition_paths",
    sql=fx.with_fixtures(
        """
    SELECT a.id,
           'audio/' || CAST(p.mid AS VARCHAR)
             || '/' || CAST(year(to_timestamp(a.pubdate + 28800)) AS VARCHAR)
             || '/' || lpad(CAST(month(to_timestamp(a.pubdate + 28800)) AS VARCHAR), 2, '0')
             || '/' || lpad(CAST(day(to_timestamp(a.pubdate + 28800)) AS VARCHAR), 2, '0')
             || '/' || a.bvid || '/' || CAST(a.id % 3 + 1 AS VARCHAR) || '.mp4' AS audio_key
    FROM archives a JOIN profiles p ON p.id = a.vtuber_profile_id
    WHERE a.id % 13 = 0
    """,
        "archives",
        "profiles",
    ),
    tags=("function", "path"),
)
def f8_partition_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: `audio/{mid}/{y}/{m:02d}/{d:02d}/{bvid}/{page}.mp4` object
    keys (modal/stream.py:317-344) — the de-facto hive partition spec
    the 100 TB layout partitions by."""
    a = fx.archives(spark, sf_dir).filter(F.col("id") % 13 == 0)
    p = fx.profiles(spark, sf_dir)
    j = a.join(F.broadcast(p), p.id == a.vtuber_profile_id)
    ts = fn.epoch_to_shanghai_ts(F.col("pubdate"))
    return j.select(
        a.id.alias("id"),
        fn.audio_object_key(F.col("mid"), ts, F.col("bvid"), a.id % 3 + 1).alias(
            "audio_key"
        ),
    )


# ---------------------------------------------------------------------------
# JSON scalar extraction over events.props (SURVEY §2.8 extension row)
# ---------------------------------------------------------------------------


@query(
    "fjson_props_extract",
    sql="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
    tags=("function", "json", "agg"),
)
def fjson_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload column
    (the §2.8 'not present in reference, available for the events
    extension' row): get_json_object + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sum_k"))
    )
