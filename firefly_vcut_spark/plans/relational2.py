"""Second relational batch — the remaining §2 inventory rows:
J3 (fact-side 3-way), J5 (left joins keeping unmatched dims),
A2 (per-group MAX watermark), P10 (pair-level anti-join placed BELOW
the expensive operator), F11 (chunk-range generation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx

# ---------------------------------------------------------------------------
# J3 — fact-side 3-way join: occurrences ⋈ vtuber_songs ⋈ profiles
# ---------------------------------------------------------------------------

_OCC_FIXTURE_SQL = """
    occurrences AS (
        SELECT vs.id AS vtuber_song_id,
               vs.song_id,
               (vs.id * 7919) % 1000 AS archive_ord,
               (vs.id * 13) % 3600   AS start
        FROM vtuber_songs vs
        WHERE vs.id % 3 <> 2
    )
"""


def _occ_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    vs = fx.vtuber_songs(spark, sf_dir)
    return vs.filter(vs.id % 3 != 2).select(
        vs.id.alias("vtuber_song_id"),
        "song_id",
        ((vs.id * 7919) % 1000).alias("archive_ord"),
        ((vs.id * 13) % 3600).alias("start"),
    )


@query(
    "j3_fact_3way_join",
    sql=fx.with_fixtures(
        f"""
    , {_OCC_FIXTURE_SQL}
    SELECT o.vtuber_song_id, o.start, s.title, p.mid
    FROM occurrences o
    JOIN vtuber_songs vs ON vs.id = o.vtuber_song_id
    JOIN songs s ON s.song_id = vs.song_id
    JOIN profiles p ON p.id = vs.vtuber_profile_id
    """,
        "songs",
        "vtuber_songs",
        "profiles",
    ),
    tags=("join",),
)
def j3_fact_3way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the occurrence-fact display join
    SongOccurrenceInLive ⋈ VtuberSong ⋈ VtuberProfile
    (dblocal.py:121-125) — fact side streams, both dims broadcast."""
    occ = _occ_fixture(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    s = fx.songs(spark, sf_dir)
    p = fx.profiles(spark, sf_dir)
    return (
        occ.join(F.broadcast(vs), vs.id == occ.vtuber_song_id)
        .join(F.broadcast(s), s.song_id == vs.song_id)
        .join(F.broadcast(p), p.id == vs.vtuber_profile_id)
        .select("vtuber_song_id", "start", "title", "mid")
    )


# ---------------------------------------------------------------------------
# J5 — left join keeping dimension rows with no bridge rows
# ---------------------------------------------------------------------------


@query(
    "j5_left_join_keep_unbridged",
    sql=fx.with_fixtures(
        """
    SELECT s.song_id, s.title, vs.id AS vtuber_song_id, vs.pubdate
    FROM songs s LEFT JOIN vtuber_songs vs
      ON vs.song_id = s.song_id AND vs.song_id % 5 <> 0
    """,
        "songs",
        "vtuber_songs",
    ),
    tags=("join",),
)
def j5_left_join_keep_unbridged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: Song ⟕ VtuberSong keeping songs with no bridge rows as
    NULLs (db/song.py:19-27,105-115 — the 'songs nobody uploaded yet'
    view). The extra join predicate creates genuinely unmatched dims."""
    s = fx.songs(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    return s.join(
        vs, (vs.song_id == s.song_id) & (vs.song_id % 5 != 0), "left"
    ).select(
        s.song_id.alias("song_id"), "title", vs.id.alias("vtuber_song_id"), "pubdate"
    )


# ---------------------------------------------------------------------------
# A2 — per-group MAX watermark (song-video discovery anchor)
# ---------------------------------------------------------------------------


@query(
    "a2_song_video_watermark",
    sql=fx.with_fixtures(
        """
    SELECT p.mid, max(vs.pubdate) AS latest_video_ts
    FROM profiles p LEFT JOIN vtuber_songs vs ON vs.vtuber_profile_id = p.id
    GROUP BY p.mid
    HAVING max(vs.pubdate) IS NOT NULL
    """,
        "profiles",
        "vtuber_songs",
    ),
    tags=("agg", "watermark"),
)
def a2_song_video_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-vtuber latest song-video pubdate (db/song.py:4-28), the
    anchor of the Mon/Thu/Sat discovery cron (modal/video.py:36-67);
    profiles with no songs are dropped post-agg (HAVING)."""
    p = fx.profiles(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    return (
        p.join(vs, vs.vtuber_profile_id == p.id, "left")
        .groupBy("mid")
        .agg(F.max("pubdate").alias("latest_video_ts"))
        .filter(F.col("latest_video_ts").isNotNull())
    )


# ---------------------------------------------------------------------------
# P10 — memoized anti-filter BELOW the expensive operator
# ---------------------------------------------------------------------------


@query(
    "p10_pair_anti_join_before_scan",
    sql=fx.with_fixtures(
        f"""
    , {_OCC_FIXTURE_SQL}
    , candidates AS (
        SELECT vs.id AS vtuber_song_id, a.id AS archive_id
        FROM vtuber_songs vs
        JOIN archives a ON a.id % 25 = vs.id % 25
        WHERE a.transcript_object_key IS NOT NULL
    )
    SELECT c.vtuber_song_id, c.archive_id
    FROM candidates c
    WHERE NOT EXISTS (
        SELECT 1 FROM occurrences o
        WHERE o.vtuber_song_id = c.vtuber_song_id
          AND (o.archive_ord % 25) = (c.archive_id % 25)
    )
    """,
        "vtuber_songs",
        "archives",
    ),
    tags=("filter", "anti", "join"),
)
def p10_pair_anti_join_before_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: skip (song, archive) pairs already scanned BEFORE the
    expensive fuzzy kernel (cmdline.py:289-320's memoized skip). The
    semi-join reduction Catalyst can't invent for a UDF stage — it
    must be placed below the scan by construction (SURVEY §4).

    Blocking modulus is 25 — an ODD modulus, deliberately: the
    fixture's transcript-bearing archive ids are ≡ 3 (mod 4), so any
    modulus sharing a factor with 4 (the original 200) produces ZERO
    candidates at every SF and the whole query hash-"passes" on
    ∅ = ∅ (the r9-judge vacuity class; the r10 non-empty gate now
    fails on it). With 25, the step-4 id wheel covers every residue,
    the memo prunes some pairs (e.g. song 0's block), and survivors
    remain — candidates, pruned set, and output all non-empty."""
    vs = fx.vtuber_songs(spark, sf_dir)
    a = fx.archives(spark, sf_dir).filter(F.col("transcript_object_key").isNotNull())
    cand = vs.join(a, a.id % 25 == vs.id % 25).select(
        vs.id.alias("vtuber_song_id"), a.id.alias("archive_id")
    )
    occ = _occ_fixture(spark, sf_dir).select(
        "vtuber_song_id", (F.col("archive_ord") % 25).alias("ord25")
    )
    return cand.join(
        F.broadcast(occ),
        (cand.vtuber_song_id == occ.vtuber_song_id)
        & ((cand.archive_id % 25) == occ.ord25),
        "left_anti",
    )


# ---------------------------------------------------------------------------
# F11 — chunk-range generation (multipart byte ranges)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# extended-surface aggregates: rollup + distinct-count (exact & sketch)
# ---------------------------------------------------------------------------


@query(
    "agg_rollup_orders",
    sql="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n,
           round(sum(o_totalprice), 4)      AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total) —
    the §2.4 'not present in reference, built-in if wanted' row,
    provided for the extended surface. Partial-aggregates each
    grouping set map-side."""
    from firefly_vcut_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@query(
    "agg_distinct_users_daily",
    sql="""
    SELECT strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per day (the expensive baseline a sketch
    replaces; Catalyst expands to a two-stage partial-distinct agg)."""
    from firefly_vcut_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "agg_hll_distinct_users",
    sql="""
    SELECT strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS hll_ok
    FROM events GROUP BY 1
    """,
    tags=("agg", "distinct", "sketch"),
)
def agg_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per day (1% rsd) — the
    mergeable-sketch scale path (one pass, fixed memory per group, no
    distinct shuffle). HLL digests differ across engines, so the
    oracle uses a TOLERANCE GATE: the query emits the exact count plus
    ``hll_ok`` = (|approx/exact − 1| ≤ 5%), and the oracle expects
    TRUE for every day — a hash-checkable assertion that the sketch
    tracks the exact count (1% rsd ⇒ 5% is > 4 sigma)."""
    from firefly_vcut_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", 0.01).alias("n_users_approx"),
        )
        .select(
            "day",
            "n_users_exact",
            (
                F.abs(
                    F.col("n_users_approx") / F.col("n_users_exact") - 1.0
                )
                <= 0.05
            ).alias("hll_ok"),
        )
    )


@query(
    "f11_chunk_ranges",
    sql=fx.with_fixtures(
        """
    SELECT id,
           CAST(i * 20000000 AS BIGINT) AS range_start,
           CAST(CASE WHEN i = n_chunks - 1 THEN -1
                     ELSE (i + 1) * 20000000 - 1 END AS BIGINT) AS range_end
    FROM (
        SELECT id,
               (duration * 40000) // 20000000 + 1 AS n_chunks,
               UNNEST(range(0, (duration * 40000) // 20000000 + 1)) AS i
        FROM archives WHERE id % 25 = 0
    )
    """,
        "archives",
    ),
    tags=("function", "array"),
)
def f11_chunk_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: multipart byte-range generation (modal/stream.py:298-314):
    20 MB chunks over an estimated payload (~40 kB/s audio), last
    range open-ended (-1 sentinel) — sequence() + arithmetic."""
    a = fx.archives(spark, sf_dir).filter(F.col("id") % 25 == 0)
    chunk = 20_000_000
    n_chunks = F.expr(f"(duration * 40000) div {chunk} + 1")
    return (
        a.select("id", n_chunks.alias("n_chunks"))
        .select("id", "n_chunks", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("i"))
        .select(
            "id",
            (F.col("i") * chunk).cast("long").alias("range_start"),
            F.when(F.col("i") == F.col("n_chunks") - 1, F.lit(-1))
            .otherwise((F.col("i") + 1) * chunk - 1)
            .cast("long")
            .alias("range_end"),
        )
    )
