"""Domain fixtures: the reference's data model re-hosted on the
driver's synthetic star schema (FIXTURES.md §B).

Every fixture is defined TWICE, in lock-step:

- a Spark builder (``DataFrame -> DataFrame``), used by the engine, and
- a DuckDB CTE (SQL string), spliced into each query's oracle SQL,

so that a registry query and its oracle run over byte-identical inputs.
Both derivations are pure, deterministic functions of the synthetic
tables — no RNG, no timestamps-of-now.

Domain mapping (reference evidence in SURVEY.md §1.2):
- ``documents``  → transcripts (segments of 5 words, pages of 10
  segments) and songs (lyrics = a few consecutive segments joined with
  newlines) — mirrors the transcript shape of transcribe.py:54-63 and
  the lyrics-fragment matching corpus of dblocal.py:77-81.
- ``orders``     → ``live_recording_archive`` incl. the mutable state
  columns driving the three work queues (db/recording.py:96-210).
- ``customer``   → ``vtuber_profile``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.sources.catalog import load_table

# Fixture scale knobs. Transcript docs ≡ 0 (mod 13); song docs ≡ 0
# (mod 91 = 13·7) so every song's source doc also has a transcript.
TRANSCRIPT_MOD = 13
SONG_MOD = 91
WORDS_PER_SEG = 5
SEGS_PER_PAGE = 10

# ---------------------------------------------------------------------------
# transcript segments  (silver shape: one row per segment — FIXTURES.md A5)
# ---------------------------------------------------------------------------

SEGMENTS_SQL = f"""
segments AS (
    SELECT
        doc_id,
        CAST(i AS INTEGER)                        AS g_idx,
        CAST(i // {SEGS_PER_PAGE} + 1 AS INTEGER) AS page,
        CAST(i % {SEGS_PER_PAGE} AS INTEGER)      AS seg_idx,
        CAST(i * {WORDS_PER_SEG} AS DOUBLE)       AS start,
        array_to_string(
            words[CAST(i AS INTEGER)*{WORDS_PER_SEG}+1 :
                  CAST(i AS INTEGER)*{WORDS_PER_SEG}+{WORDS_PER_SEG}], ' ') AS text
    FROM (
        SELECT doc_id, words,
               UNNEST(range(0, (len(words)-1)//{WORDS_PER_SEG} + 1)) AS i
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents
            WHERE doc_id % {TRANSCRIPT_MOD} = 0 AND length(text) > 0
        )
    )
)"""


def segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript segments: one row per 5-word segment, 10 segments per
    page — the normalized form of the nested array-of-array-of-struct
    transcript (reference transcribe.py:54-63), built without a shuffle
    (per-row sequence + slice, no explode-then-groupBy)."""
    w = WORDS_PER_SEG
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % TRANSCRIPT_MOD == 0) & (F.length("text") > 0))
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    return (
        docs.select(
            "doc_id",
            "words",
            F.explode(
                F.sequence(F.lit(0), F.expr(f"(size(words)-1) div {w}"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("g_idx"),
            (F.col("i") / SEGS_PER_PAGE + 1).cast("int").alias("page"),
            (F.col("i") % SEGS_PER_PAGE).cast("int").alias("seg_idx"),
            (F.col("i") * w).cast("double").alias("start"),
            F.array_join(
                F.slice(F.col("words"), F.col("i").cast("int") * w + 1, w), " "
            ).alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# songs  (dimension with multi-line lyrics_fragment — FIXTURES.md A2)
# ---------------------------------------------------------------------------

_LYRICS_BODY_SQL = f"""array_to_string(
            list_transform(
                list_filter(range((doc_id//{SONG_MOD}) % 2,
                                  (doc_id//{SONG_MOD}) % 2 + 1 + (doc_id//{SONG_MOD}) % 3),
                            g -> g*{WORDS_PER_SEG} < len(words)),
                g -> array_to_string(
                        words[CAST(g AS INTEGER)*{WORDS_PER_SEG}+1 :
                              CAST(g AS INTEGER)*{WORDS_PER_SEG}+{WORDS_PER_SEG}], ' ')),
            chr(10))"""

SONGS_SQL = f"""
songs AS (
    SELECT
        doc_id                                   AS song_id,
        'song-' || CAST(doc_id AS VARCHAR)       AS title,
        CASE WHEN (doc_id//{SONG_MOD}) % 7 = 3 THEN NULL
             WHEN (doc_id//{SONG_MOD}) % 7 = 5 THEN ''
             ELSE {_LYRICS_BODY_SQL}
        END                                      AS lyrics_fragment
    FROM (
        SELECT doc_id, string_split(text, ' ') AS words
        FROM documents
        WHERE doc_id % {SONG_MOD} = 0 AND length(text) > 0
    )
)"""


def songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Song dimension: lyrics_fragment = 1–3 consecutive transcript
    segments of the source doc joined with newlines, so the flagship
    scan finds exact planted matches; every 7th song gets NULL / ''
    lyrics to exercise the P5 exclusion filter (dblocal.py:77-81)."""
    w = WORDS_PER_SEG
    n = F.expr(f"doc_id div {SONG_MOD}")
    j = n % 2
    k = n % 3 + 1
    lyrics = F.array_join(
        F.transform(
            F.filter(
                F.sequence(j, j + k - 1),
                lambda g: g * w < F.size("words"),
            ),
            lambda g: F.array_join(F.slice(F.col("words"), g.cast("int") * w + 1, w), " "),
        ),
        "\n",
    )
    return (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % SONG_MOD == 0) & (F.length("text") > 0))
        .select("doc_id", F.split("text", " ").alias("words"))
        .select(
            F.col("doc_id").alias("song_id"),
            F.concat(F.lit("song-"), F.col("doc_id").cast("string")).alias("title"),
            F.when(n % 7 == 3, F.lit(None).cast("string"))
            .when(n % 7 == 5, F.lit(""))
            .otherwise(lyrics)
            .alias("lyrics_fragment"),
        )
    )


# ---------------------------------------------------------------------------
# vtuber_profile  (tiny dimension — FIXTURES.md A1)
# ---------------------------------------------------------------------------

PROFILES_SQL = """
profiles AS (
    SELECT c_custkey AS id, 100000 + c_custkey AS mid
    FROM customer
)"""


def profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        (F.lit(100000) + F.col("c_custkey")).alias("mid"),
    )


# ---------------------------------------------------------------------------
# vtuber_song  (bridge — FIXTURES.md A3; even songs get 2 rows so
# ARRAY_AGG (A3) and the zip-join (J9) have real multi-element arrays)
# ---------------------------------------------------------------------------

VTUBER_SONGS_SQL = f"""
vtuber_songs AS (
    SELECT s.song_id * 10 + dup.d                        AS id,
           s.song_id                                     AS song_id,
           (s.song_id * 37 + dup.d * 11) % 150 + 1       AS vtuber_profile_id,
           CASE WHEN s.song_id % 3 = 0
                THEN 'BV' || lpad(CAST(s.song_id AS VARCHAR), 10, '0') END AS bvid,
           1600000000 + s.song_id * 3600 + dup.d * 60    AS pubdate
    FROM (SELECT doc_id AS song_id FROM documents
          WHERE doc_id % {SONG_MOD} = 0 AND length(text) > 0) s,
         (SELECT UNNEST([0, 1]) AS d) dup
    WHERE dup.d = 0 OR s.song_id % 2 = 0
)"""


def vtuber_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % SONG_MOD == 0) & (F.length("text") > 0))
        .select(F.col("doc_id").alias("song_id"))
    )
    return (
        base.select("song_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("d"))
        .filter((F.col("d") == 0) | (F.col("song_id") % 2 == 0))
        .select(
            (F.col("song_id") * 10 + F.col("d")).alias("id"),
            "song_id",
            ((F.col("song_id") * 37 + F.col("d") * 11) % 150 + 1).alias(
                "vtuber_profile_id"
            ),
            F.when(
                F.col("song_id") % 3 == 0,
                F.concat(F.lit("BV"), F.lpad(F.col("song_id").cast("string"), 10, "0")),
            ).alias("bvid"),
            (F.lit(1600000000) + F.col("song_id") * 3600 + F.col("d") * 60).alias(
                "pubdate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# live_recording_archive  (fact + mutable state machine — FIXTURES.md A4)
#
# State machine (db/recording.py:96-210):
#   m = o_orderkey % 4
#   m=0: audio NULL,  transcript NULL   → needs streaming
#   m=1: audio [],    transcript NULL   → needs streaming
#   m=2: audio [2 keys], transcript NULL → needs transcription
#   m=3: audio NULL (GC'd), transcript set → needs occurrence scan,
#        unless o_orderkey % 8 = 7 (already scanned).
# Titles: every 7th archive lacks the 《YYYY年M月D日H点场》date pattern so
# the F1 regex extraction genuinely drops rows (db/recording.py:62).
# ---------------------------------------------------------------------------

ARCHIVES_SQL = """
archives AS (
    SELECT
        o_orderkey                                             AS id,
        'BV' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')     AS bvid,
        CASE WHEN o_orderkey % 7 = 0
             THEN 'untitled stream #' || CAST(o_orderkey AS VARCHAR)
             ELSE '【直播回放】' || CAST(year(o_orderdate) AS VARCHAR) || '年'
                  || CAST(month(o_orderdate) AS VARCHAR) || '月'
                  || CAST(day(o_orderdate) AS VARCHAR) || '日'
                  || CAST(o_orderkey % 24 AS VARCHAR) || '点场'
        END                                                    AS title,
        o_custkey                                              AS vtuber_profile_id,
        CAST(epoch(o_orderdate) AS BIGINT) + (o_orderkey % 86400) AS pubdate,
        600 + o_orderkey % 14400                               AS duration,
        'https://img.example/BV' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') || '.jpg' AS cover,
        CASE o_orderkey % 4
            WHEN 1 THEN []::VARCHAR[]
            WHEN 2 THEN [
                'audio/' || CAST(o_custkey AS VARCHAR) || '/BV'
                 || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') || '/1.mp4',
                'audio/' || CAST(o_custkey AS VARCHAR) || '/BV'
                 || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') || '/2.mp4']
        END                                                    AS audio_object_keys,
        CASE WHEN o_orderkey % 4 = 3
             THEN 'transcripts/BV' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') || '.json'
        END                                                    AS transcript_object_key,
        CASE WHEN o_orderkey % 8 = 7
             THEN TIMESTAMP '2024-06-01 00:00:00'
        END                                                    AS last_song_occurrence_scan
    FROM orders
)"""


def archives(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    bvid = F.concat(F.lit("BV"), F.lpad(k.cast("string"), 10, "0"))
    dated_title = F.concat(
        F.lit("【直播回放】"),
        F.year("o_orderdate").cast("string"), F.lit("年"),
        F.month("o_orderdate").cast("string"), F.lit("月"),
        F.dayofmonth("o_orderdate").cast("string"), F.lit("日"),
        (k % 24).cast("string"), F.lit("点场"),
    )
    audio_key = lambda page: F.concat(  # noqa: E731
        F.lit("audio/"), F.col("o_custkey").cast("string"), F.lit("/"), bvid,
        F.lit(f"/{page}.mp4"),
    )
    return load_table(spark, sf_dir, "orders").select(
        k.alias("id"),
        bvid.alias("bvid"),
        F.when(
            k % 7 == 0,
            F.concat(F.lit("untitled stream #"), k.cast("string")),
        ).otherwise(dated_title).alias("title"),
        F.col("o_custkey").alias("vtuber_profile_id"),
        (F.unix_timestamp("o_orderdate") + (k % 86400)).alias("pubdate"),
        (F.lit(600) + k % 14400).alias("duration"),
        F.concat(F.lit("https://img.example/"), bvid, F.lit(".jpg")).alias("cover"),
        F.when(k % 4 == 1, F.array().cast("array<string>"))
        .when(k % 4 == 2, F.array(audio_key(1), audio_key(2)))
        .alias("audio_object_keys"),
        F.when(
            k % 4 == 3,
            F.concat(F.lit("transcripts/"), bvid, F.lit(".json")),
        ).alias("transcript_object_key"),
        F.when(
            k % 8 == 7, F.lit("2024-06-01 00:00:00").cast("timestamp")
        ).alias("last_song_occurrence_scan"),
    )


# ---------------------------------------------------------------------------
# CTE composition helper
# ---------------------------------------------------------------------------

FIXTURE_SQL: dict[str, str] = {
    "segments": SEGMENTS_SQL,
    "songs": SONGS_SQL,
    "profiles": PROFILES_SQL,
    "vtuber_songs": VTUBER_SONGS_SQL,
    "archives": ARCHIVES_SQL,
}

FIXTURE_BUILDERS = {
    "segments": segments,
    "songs": songs,
    "profiles": profiles,
    "vtuber_songs": vtuber_songs,
    "archives": archives,
}


def with_fixtures(body: str, *names: str) -> str:
    """Compose an oracle SQL string: WITH <fixture CTEs> <body>.

    The body may itself start with additional CTEs by beginning with
    ``", name AS (...)  SELECT ..."`` — callers pass bodies starting
    with SELECT or with a leading comma for extra CTEs.
    """
    ctes = ",".join(FIXTURE_SQL[n] for n in names)
    return f"WITH {ctes}\n{body}"


def songs_with_valid_lyrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``songs`` rows passing the P5 filter (lyrics_fragment NOT NULL
    and != ''), with the predicate expressed on BASE columns instead
    of the constructed lyrics column: NULL ⇔ n%7==3, '' ⇔ n%7==5 (the
    planted empty) or no window survives — the minimum group g=n%2
    exists iff (n%2)·WORDS_PER_SEG < len(words). Verified identical to
    the lyrics-column filter at sf0.001→sf10.

    Why this exists (r8): filtering on the lyrics column inlines the
    whole window-assembly HOF expression into the Filter predicate,
    and under AQE at sf10 Spark 4.1 mis-binds that predicate's lambda
    attributes against the OTHER documents-derived branch of a
    self-join ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] in FilterExec —
    SCALING.md §sf10). A base-column predicate is also the better
    plan: it pushes toward the scan instead of re-evaluating the
    window assembly per filtered row."""
    n = F.expr(f"doc_id div {SONG_MOD}")
    n_words = F.size(F.split("text", " "))
    valid = (~(n % 7).isin(3, 5)) & ((n % 2) * WORDS_PER_SEG < n_words)
    ids = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % SONG_MOD == 0) & (F.length("text") > 0) & valid)
        .select(F.col("doc_id").alias("song_id"))
    )
    return songs(spark, sf_dir).join(ids, "song_id", "left_semi")
