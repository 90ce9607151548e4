"""Pipeline state machine: work queues, watermark incremental fetch,
argmax, and the A6/J10 merge recipes read back as snapshot queries
(SURVEY.md §2.2 P3-P8, §2.4 A4/A6, §2.5 W2, §2.3 J10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.merge import (
    insert_ignore,
    update_join,
    upsert_last_wins,
)
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx
from firefly_vcut_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# P3/P4/P6 + T1 — the three work-queue queries over archive state
# ---------------------------------------------------------------------------


@query(
    "p_queue_needs_streaming",
    sql=fx.with_fixtures(
        """
    SELECT id, bvid, pubdate
    FROM archives
    WHERE (audio_object_keys IS NULL OR len(audio_object_keys) = 0)
      AND transcript_object_key IS NULL
    ORDER BY pubdate DESC, id ASC
    LIMIT 10
    """,
        "archives",
    ),
    tags=("filter", "statemachine", "topk"),
)
def p_queue_needs_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work queue 1: archives never streamed — NULL/empty audio keys
    and no transcript, newest first, LIMIT 10 (db/recording.py:119-138
    incl. the array-length predicate P4)."""
    a = fx.archives(spark, sf_dir)
    cond = (
        F.col("audio_object_keys").isNull() | (F.size("audio_object_keys") == 0)
    ) & F.col("transcript_object_key").isNull()
    return (
        a.filter(cond)
        .orderBy(F.desc("pubdate"), F.asc("id"))
        .limit(10)
        .select("id", "bvid", "pubdate")
    )


@query(
    "p_queue_needs_transcription",
    sql=fx.with_fixtures(
        """
    SELECT id, bvid, CAST(len(audio_object_keys) AS BIGINT) AS n_pages
    FROM archives
    WHERE audio_object_keys IS NOT NULL AND len(audio_object_keys) > 0
      AND transcript_object_key IS NULL
    """,
        "archives",
    ),
    tags=("filter", "statemachine"),
)
def p_queue_needs_transcription(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work queue 2: streamed but untranscribed — non-empty audio keys,
    no transcript (db/recording.py:141-178)."""
    a = fx.archives(spark, sf_dir)
    return a.filter(
        F.col("audio_object_keys").isNotNull()
        & (F.size("audio_object_keys") > 0)
        & F.col("transcript_object_key").isNull()
    ).select("id", "bvid", F.size("audio_object_keys").cast("long").alias("n_pages"))


@query(
    "p_queue_needs_occurrence_scan",
    sql=fx.with_fixtures(
        """
    SELECT id, bvid, transcript_object_key
    FROM archives
    WHERE transcript_object_key IS NOT NULL
      AND last_song_occurrence_scan IS NULL
    """,
        "archives",
    ),
    tags=("filter", "statemachine"),
)
def p_queue_needs_occurrence_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work queue 3: transcribed but unscanned (db/recording.py:180-210);
    feeds the flagship W1 scan."""
    a = fx.archives(spark, sf_dir)
    return a.filter(
        F.col("transcript_object_key").isNotNull()
        & F.col("last_song_occurrence_scan").isNull()
    ).select("id", "bvid", "transcript_object_key")


# ---------------------------------------------------------------------------
# P9 — prefix filter
# ---------------------------------------------------------------------------


@query(
    "p9_prefix_filter",
    sql=fx.with_fixtures(
        """
    SELECT id, bvid FROM archives WHERE bvid LIKE 'BV00000000%'
    """,
        "archives",
    ),
    tags=("filter",),
)
def p9_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: `startswith` file matching (transcribe.py:75-77) as a
    prefix predicate — pushed to the scan as StringStartsWith."""
    return (
        fx.archives(spark, sf_dir)
        .filter(F.col("bvid").startswith("BV00000000"))
        .select("id", "bvid")
    )


# ---------------------------------------------------------------------------
# W2 — watermark incremental fetch: keep archives OUTSIDE [oldest, latest]
# ---------------------------------------------------------------------------


@query(
    "w2_watermark_incremental",
    sql=fx.with_fixtures(
        """
    , wm AS (
        SELECT p.id AS profile_id,
               max(a.pubdate) AS latest, min(a.pubdate) AS oldest
        FROM profiles p JOIN archives a ON a.vtuber_profile_id = p.id
        WHERE a.id % 2 = 0
        GROUP BY p.id
    )
    SELECT a.id, a.bvid, a.pubdate, w.profile_id
    FROM archives a JOIN wm w ON a.vtuber_profile_id = w.profile_id
    WHERE NOT (a.pubdate <= w.latest AND a.pubdate >= w.oldest)
    """,
        "profiles",
        "archives",
    ),
    tags=("watermark", "join", "filter"),
)
def w2_watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: incremental discovery keeps incoming archives strictly
    OUTSIDE the per-profile [oldest, latest] watermark range —
    NOT(inside), inclusive bounds, the easy-to-invert predicate of
    series.py:100-109 (SURVEY §7.3). Here the 'known' set is the even
    half of archives; the odd half plays the incoming REST page."""
    a = fx.archives(spark, sf_dir)
    p = fx.profiles(spark, sf_dir)
    known = a.filter(F.col("id") % 2 == 0)
    wm = (
        p.join(known, known.vtuber_profile_id == p.id)
        .groupBy(known.vtuber_profile_id.alias("profile_id"))
        .agg(F.max("pubdate").alias("latest"), F.min("pubdate").alias("oldest"))
    )
    return (
        a.join(F.broadcast(wm), a.vtuber_profile_id == wm.profile_id)
        .filter(~((F.col("pubdate") <= F.col("latest")) & (F.col("pubdate") >= F.col("oldest"))))
        .select(a.id.alias("id"), "bvid", "pubdate", "profile_id")
    )


# ---------------------------------------------------------------------------
# A4 — standalone tie-stable argmax (events domain)
# ---------------------------------------------------------------------------


@query(
    "a4_argmax_best_event",
    sql="""
    SELECT user_id, event_id AS best_event_id, value AS best_value
    FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY value DESC, ts ASC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("agg", "argmax"),
)
def a4_argmax_best_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: tie-stable argmax per group (fuzz.py:16-43's running max
    with strict >): max_by on an ordering struct — partial aggregation,
    no window sort of the full table."""
    ev = load_table(spark, sf_dir, "events")
    ordering = F.struct(
        F.col("value"),
        (-F.unix_micros("ts")).alias("neg_ts"),
        (-F.col("event_id")).alias("neg_id"),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(F.struct("event_id", "value"), ordering).alias("b"))
        .select(
            "user_id",
            F.col("b.event_id").alias("best_event_id"),
            F.col("b.value").alias("best_value"),
        )
    )


# ---------------------------------------------------------------------------
# A6 — merge recipes read back as snapshot queries
# ---------------------------------------------------------------------------

# base is grouped to key-uniqueness: the synthetic lineitem contains
# duplicate (l_orderkey, l_partkey) pairs at some scale factors, and an
# upsert target must be key-unique for merge semantics to be well-defined.
_OCC_BASE_SQL = """
    occ_base AS (
        SELECT l_orderkey AS archive_id, l_partkey AS vtuber_song_id,
               CAST(max(l_suppkey * 10) AS BIGINT) AS start,
               CAST(max(l_linenumber) AS BIGINT) AS page
        FROM lineitem WHERE l_linenumber = 1
        GROUP BY 1, 2
    ),
    occ_updates AS (
        SELECT archive_id, vtuber_song_id, start + 500 AS start, page + 1 AS page
        FROM occ_base WHERE archive_id % 3 = 0
        UNION ALL
        SELECT l_orderkey + 10000000 AS archive_id, l_partkey AS vtuber_song_id,
               CAST(l_suppkey AS BIGINT) AS start, CAST(2 AS BIGINT) AS page
        FROM lineitem WHERE l_linenumber = 2 AND l_orderkey % 5 = 0
    )
"""


def _occ_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") == 1)
        .groupBy(
            F.col("l_orderkey").alias("archive_id"),
            F.col("l_partkey").alias("vtuber_song_id"),
        )
        .agg(
            F.max(F.col("l_suppkey") * 10).cast("long").alias("start"),
            F.max("l_linenumber").cast("long").alias("page"),
        )
    )


def _occ_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base_mod = _occ_base(spark, sf_dir).filter(F.col("archive_id") % 3 == 0).select(
        "archive_id",
        "vtuber_song_id",
        (F.col("start") + 500).alias("start"),
        (F.col("page") + 1).alias("page"),
    )
    fresh = li.filter((F.col("l_linenumber") == 2) & (F.col("l_orderkey") % 5 == 0)).select(
        (F.col("l_orderkey") + 10000000).alias("archive_id"),
        F.col("l_partkey").alias("vtuber_song_id"),
        F.col("l_suppkey").cast("long").alias("start"),
        F.lit(2).cast("long").alias("page"),
    )
    return base_mod.unionByName(fresh)


@query(
    "a6_upsert_last_wins",
    sql=f"""
    WITH {_OCC_BASE_SQL}
    SELECT coalesce(u.archive_id, b.archive_id)           AS archive_id,
           coalesce(u.vtuber_song_id, b.vtuber_song_id)   AS vtuber_song_id,
           coalesce(u.start, b.start)                     AS start,
           coalesce(u.page, b.page)                       AS page
    FROM occ_base b FULL OUTER JOIN occ_updates u
      ON b.archive_id = u.archive_id AND b.vtuber_song_id = u.vtuber_song_id
    """,
    tags=("merge", "statemachine"),
)
def a6_upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 upsert, last-writer-wins: occurrence re-scan overwrites
    (start, page) on conflict and appends new pairs
    (db/occurrence.py:22-51). Snapshot-in → snapshot-out; the oracle
    states the same semantics as a FULL OUTER JOIN + coalesce."""
    return upsert_last_wins(
        _occ_base(spark, sf_dir),
        _occ_updates(spark, sf_dir),
        keys=("archive_id", "vtuber_song_id"),
    )


@query(
    "a6_insert_ignore",
    sql=f"""
    WITH {_OCC_BASE_SQL}
    SELECT b.archive_id, b.vtuber_song_id, b.start, b.page FROM occ_base b
    UNION ALL
    SELECT u.archive_id, u.vtuber_song_id, u.start, u.page
    FROM occ_updates u
    WHERE NOT EXISTS (
        SELECT 1 FROM occ_base b
        WHERE b.archive_id = u.archive_id AND b.vtuber_song_id = u.vtuber_song_id
    )
    """,
    tags=("merge", "statemachine"),
)
def a6_insert_ignore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 insert, first-writer-wins: archive discovery never overwrites
    an existing bvid row (ON CONFLICT DO NOTHING, db/recording.py:49)."""
    return insert_ignore(
        _occ_base(spark, sf_dir),
        _occ_updates(spark, sf_dir),
        keys=("archive_id", "vtuber_song_id"),
    )


@query(
    "j10_update_join",
    sql=fx.with_fixtures(
        """
    , upd AS (
        SELECT bvid, 'transcripts/uploaded/' || bvid || '.json' AS new_key
        FROM archives WHERE id % 10 = 4
    )
    SELECT a.id, a.bvid,
           coalesce(u.new_key, a.transcript_object_key) AS transcript_object_key
    FROM archives a LEFT JOIN upd u ON u.bvid = a.bvid
    """,
        "archives",
    ),
    tags=("merge", "join", "statemachine"),
)
def j10_update_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: join-driven UPDATE — bulk-set transcript keys for uploaded
    bvids, all other rows untouched (dblocal.py:225-250's
    UPDATE ... FROM (VALUES))."""
    a = fx.archives(spark, sf_dir)
    upd = a.filter(F.col("id") % 10 == 4).select(
        "bvid",
        F.concat(F.lit("transcripts/uploaded/"), F.col("bvid"), F.lit(".json")).alias(
            "transcript_object_key"
        ),
    )
    return update_join(
        a, upd, keys=("bvid",), set_cols=("transcript_object_key",)
    ).select("id", "bvid", "transcript_object_key")
