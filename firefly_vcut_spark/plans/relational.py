"""Relational core: scans, filters, joins, aggregates, top-k, set ops
(SURVEY.md §2.1–2.7).

Each query re-hosts a reference access pattern on the synthetic star
schema / domain fixtures, as a (Spark program, DuckDB oracle) pair.
Docstrings cite the reference behavior being reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx
from firefly_vcut_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# S1/P1/P2 — projection + predicate scan
# ---------------------------------------------------------------------------


@query(
    "s1_scan_pushdown",
    sql="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount > 0.05
      AND l_returnflag = 'N'
    """,
    tags=("scan", "filter", "projection"),
)
def s1_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + multi-predicate scan (reference S1/P1/P2: every SQL
    in db/recording.py names columns and pushes predicates; Catalyst
    pushes both into the parquet scan — verify with PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") == "N")
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_quantity",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J1 — inner equi-join, small dim broadcast (db/recording.py:127-128)
# ---------------------------------------------------------------------------


@query(
    "j1_join_archive_profile",
    sql=fx.with_fixtures(
        """
    SELECT a.id, a.bvid, a.pubdate, p.mid
    FROM archives a JOIN profiles p ON a.vtuber_profile_id = p.id
    """,
        "archives",
        "profiles",
    ),
    tags=("join",),
)
def j1_join_archive_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner 2-way equi-join archive⋈profile (db/recording.py:127-128,
    dblocal.py:24). Profile dim is tiny → explicit broadcast hash join,
    no shuffle of the fact side."""
    a = fx.archives(spark, sf_dir)
    p = fx.profiles(spark, sf_dir)
    return a.join(F.broadcast(p), a.vtuber_profile_id == p.id, "inner").select(
        a.id.alias("id"), "bvid", "pubdate", "mid"
    )


# ---------------------------------------------------------------------------
# J2 — 3-way chain Song ⋈ VtuberSong ⋈ VtuberProfile (dblocal.py:77-81)
# ---------------------------------------------------------------------------


@query(
    "j2_join_3way_chain",
    sql=fx.with_fixtures(
        """
    SELECT s.song_id, s.title, vs.id AS vtuber_song_id, p.mid
    FROM songs s
    JOIN vtuber_songs vs ON vs.song_id = s.song_id
    JOIN profiles p ON p.id = vs.vtuber_profile_id
    WHERE s.lyrics_fragment IS NOT NULL AND s.lyrics_fragment <> ''
    """,
        "songs",
        "vtuber_songs",
        "profiles",
    ),
    tags=("join", "filter"),
)
def j2_join_3way_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way dimension chain with the P5 non-empty-lyrics predicate
    (dblocal.py:77-81). Catalyst broadcast-joins both small dims."""
    # P5 filter via fx.songs_with_valid_lyrics: the predicate lives on
    # base columns, not the constructed lyrics HOF — filtering on the
    # HOF column mis-binds under AQE at sf10 (Spark 4.1
    # ATTRIBUTE_NOT_FOUND in FilterExec; fixture docstring + SCALING.md
    # §sf10) and re-evaluates the window assembly per row besides.
    s = fx.songs_with_valid_lyrics(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    p = fx.profiles(spark, sf_dir)
    return (
        s.join(vs, vs.song_id == s.song_id, "inner")
        .join(F.broadcast(p), p.id == vs.vtuber_profile_id, "inner")
        .select(s.song_id.alias("song_id"), "title", vs.id.alias("vtuber_song_id"), "mid")
    )


# ---------------------------------------------------------------------------
# J4 + A1 — left join + per-group watermarks (db/recording.py:84-94)
# ---------------------------------------------------------------------------


@query(
    "a1_watermarks_per_profile",
    sql=fx.with_fixtures(
        """
    SELECT p.mid,
           max(a.pubdate) AS latest_recording_ts,
           min(a.pubdate) AS oldest_recording_ts
    FROM profiles p LEFT JOIN archives a ON a.vtuber_profile_id = p.id
    GROUP BY p.mid
    """,
        "profiles",
        "archives",
    ),
    tags=("join", "agg", "watermark"),
)
def a1_watermarks_per_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vtuber MAX/MIN pubdate watermark over a LEFT JOIN, keeping
    profiles with no recordings as NULL watermarks
    (db/recording.py:84-94) — the anchor of incremental discovery W2."""
    p = fx.profiles(spark, sf_dir)
    a = fx.archives(spark, sf_dir)
    return (
        p.join(a, a.vtuber_profile_id == p.id, "left")
        .groupBy("mid")
        .agg(
            F.max("pubdate").alias("latest_recording_ts"),
            F.min("pubdate").alias("oldest_recording_ts"),
        )
    )


# ---------------------------------------------------------------------------
# J7 — anti-join (cmdline.py:164-170: local archives minus known bvids)
# ---------------------------------------------------------------------------


@query(
    "j7_anti_join_unknown_bvids",
    sql=fx.with_fixtures(
        """
    SELECT a.id, a.bvid
    FROM archives a
    WHERE NOT EXISTS (SELECT 1 FROM vtuber_songs vs WHERE vs.bvid = a.bvid)
      AND a.pubdate % 5 = 0
    """,
        "archives",
        "vtuber_songs",
    ),
    tags=("join", "anti"),
)
def j7_anti_join_unknown_bvids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference as left-anti join (cmdline.py:164-170 computes
    `local_bvids - db_bvids` in Python sets; here it's a broadcast
    anti-join so the big side never shuffles)."""
    a = fx.archives(spark, sf_dir).filter(F.col("pubdate") % 5 == 0)
    known = fx.vtuber_songs(spark, sf_dir).select("bvid").filter(
        F.col("bvid").isNotNull()
    )
    return a.join(F.broadcast(known), "bvid", "left_anti").select("id", "bvid")


# ---------------------------------------------------------------------------
# T1 — ORDER BY + LIMIT top-k (db/recording.py:135-137, dblocal.py:40-49)
# ---------------------------------------------------------------------------


@query(
    "t1_topk_recent_archives",
    sql=fx.with_fixtures(
        """
    SELECT id, bvid, pubdate
    FROM archives
    ORDER BY pubdate DESC, id ASC
    LIMIT 25
    """,
        "archives",
    ),
    tags=("topk",),
)
def t1_topk_recent_archives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most recent archives (ORDER BY pubdate DESC LIMIT n —
    db/recording.py:135-137). Catalyst plans TakeOrderedAndProject:
    per-partition heaps, no global sort. `id` tiebreak keeps the k-th
    row deterministic."""
    return (
        fx.archives(spark, sf_dir)
        .orderBy(F.desc("pubdate"), F.asc("id"))
        .limit(25)
        .select("id", "bvid", "pubdate")
    )


# ---------------------------------------------------------------------------
# A3 — group-by ARRAY_AGG (db/song.py:87-116)
# ---------------------------------------------------------------------------


@query(
    "a3_array_agg_song_bridge",
    sql=fx.with_fixtures(
        """
    SELECT s.song_id,
           array_to_string(array_agg(vs.id ORDER BY vs.id), ',') AS vtuber_song_ids,
           array_to_string(array_agg(vs.vtuber_profile_id ORDER BY vs.id), ',')
               AS vtuber_profile_ids
    FROM songs s JOIN vtuber_songs vs ON vs.song_id = s.song_id
    WHERE s.lyrics_fragment IS NOT NULL AND s.lyrics_fragment <> ''
    GROUP BY s.song_id
    """,
        "songs",
        "vtuber_songs",
    ),
    tags=("agg", "array"),
)
def a3_array_agg_song_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG of bridge ids per song (db/song.py:87-116). The two
    arrays are positionally aligned (same ORDER BY vs.id on both), the
    invariant the J9 zip-join depends on. Arrays serialized to CSV
    strings for a stable cross-engine hash; inner join (not left) so
    the Postgres `[NULL]`-array quirk (SURVEY §7.3) never arises."""
    # P5 filter via fx.songs_with_valid_lyrics: the predicate lives on
    # base columns, not the constructed lyrics HOF — filtering on the
    # HOF column mis-binds under AQE at sf10 (Spark 4.1
    # ATTRIBUTE_NOT_FOUND in FilterExec; fixture docstring + SCALING.md
    # §sf10) and re-evaluates the window assembly per row besides.
    s = fx.songs_with_valid_lyrics(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    paired = s.join(vs, "song_id").select("song_id", vs.id.alias("vs_id"), "vtuber_profile_id")
    # collect (vs_id, vp_id) structs, sort once, project both arrays —
    # a single shuffle, positional alignment guaranteed by the struct.
    return (
        paired.groupBy("song_id")
        .agg(F.sort_array(F.collect_list(F.struct("vs_id", "vtuber_profile_id"))).alias("z"))
        .select(
            "song_id",
            F.array_join(F.transform("z", lambda x: x.vs_id.cast("string")), ",").alias(
                "vtuber_song_ids"
            ),
            F.array_join(
                F.transform("z", lambda x: x.vtuber_profile_id.cast("string")), ","
            ).alias("vtuber_profile_ids"),
        )
    )


# ---------------------------------------------------------------------------
# J9 — positional zip-join over paired arrays (modal/occurrence.py:48-61)
# ---------------------------------------------------------------------------


@query(
    "j9_zip_join_paired_arrays",
    sql=fx.with_fixtures(
        """
    , agg AS (
        SELECT s.song_id,
               array_agg(vs.id ORDER BY vs.id) AS vs_ids,
               array_agg(vs.vtuber_profile_id ORDER BY vs.id) AS vp_ids
        FROM songs s JOIN vtuber_songs vs ON vs.song_id = s.song_id
        GROUP BY s.song_id
    )
    SELECT song_id,
           UNNEST(vs_ids) AS vtuber_song_id,
           UNNEST(vp_ids) AS vtuber_profile_id
    FROM agg
    """,
        "songs",
        "vtuber_songs",
    ),
    tags=("join", "array"),
)
def j9_zip_join_paired_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-pair `vtuber_song_ids[i]` with `vtuber_profile_ids[i]`
    (modal/occurrence.py:48-61's enumerate-and-index) as
    arrays_zip+explode. Production advice in SURVEY §2.3 J9 is to skip
    the agg entirely; this query proves the positional semantics."""
    s = fx.songs(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    agg = (
        s.join(vs, "song_id")
        .select("song_id", vs.id.alias("vs_id"), "vtuber_profile_id")
        .groupBy("song_id")
        .agg(F.sort_array(F.collect_list(F.struct("vs_id", "vtuber_profile_id"))).alias("z"))
    )
    return agg.select(
        "song_id", F.explode("z").alias("pair")
    ).select(
        "song_id",
        F.col("pair.vs_id").alias("vtuber_song_id"),
        F.col("pair.vtuber_profile_id").alias("vtuber_profile_id"),
    )


# ---------------------------------------------------------------------------
# J6 — broadcast map-lookup join (modal/video.py:42-98)
# ---------------------------------------------------------------------------


@query(
    "j6_broadcast_title_lookup",
    sql=fx.with_fixtures(
        """
    , discovered AS (
        SELECT 'song-' || CAST(doc_id AS VARCHAR) AS video_title,
               (doc_id * 37) % 150 + 1            AS uploader_profile_id,
               doc_id * 131                       AS video_pubdate
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT d.video_title, d.video_pubdate, vs.id AS vtuber_song_id
    FROM discovered d
    JOIN songs s ON s.title = d.video_title
    JOIN vtuber_songs vs
      ON vs.song_id = s.song_id AND vs.vtuber_profile_id = d.uploader_profile_id
    """,
        "songs",
        "vtuber_songs",
    ),
    tags=("join", "broadcast"),
)
def j6_broadcast_title_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The title→(profile→vtuber_song) dict probe of modal/video.py:42-98
    as a broadcast join on (title, profile). Unmatched discovered videos
    (the reference's 'unknown song' prints) are the anti-join complement
    and simply drop out of the inner join."""
    discovered = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            F.concat(F.lit("song-"), F.col("doc_id").cast("string")).alias("video_title"),
            ((F.col("doc_id") * 37) % 150 + 1).alias("uploader_profile_id"),
            (F.col("doc_id") * 131).alias("video_pubdate"),
        )
    )
    s = fx.songs(spark, sf_dir)
    vs = fx.vtuber_songs(spark, sf_dir)
    lookup = vs.join(s, "song_id").select(
        "title", "vtuber_profile_id", vs.id.alias("vtuber_song_id")
    )
    return discovered.join(
        F.broadcast(lookup),
        (lookup.title == discovered.video_title)
        & (lookup.vtuber_profile_id == discovered.uploader_profile_id),
        "inner",
    ).select("video_title", "video_pubdate", "vtuber_song_id")


# ---------------------------------------------------------------------------
# J8 — cross join (bounded; the flagship uses the real one)
# ---------------------------------------------------------------------------


@query(
    "j8_cross_join_dims",
    sql="""
    SELECT CAST(n.n_nationkey AS BIGINT) AS n_nationkey,
           CAST(r.r_regionkey AS BIGINT) AS r_regionkey,
           n.n_name, r.r_name
    FROM nation n CROSS JOIN region r
    """,
    tags=("join", "cross"),
)
def j8_cross_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two dims (the reference's every-song×every-
    transcript loop, cmdline.py:308-350, shrunk to dimension scale;
    the full-size version is the flagship). Spark plans
    BroadcastNestedLoopJoin with the small side broadcast."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        F.col("r_regionkey").cast("long").alias("r_regionkey"),
        "n_name",
        "r_name",
    )


# ---------------------------------------------------------------------------
# §2.7 — set ops: union-all accumulation + intersect
# ---------------------------------------------------------------------------


@query(
    "set_union_accumulate",
    sql="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'signup'
    """,
    tags=("setop",),
)
def set_union_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL accumulation (the reference appends result lists
    across loop iterations, series.py:67-109 → unionByName)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "signup")
    return a.unionByName(b).select("event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# A5 — scalar aggregate accumulators (cmdline.py:432-474)
# ---------------------------------------------------------------------------


@query(
    "a5_scalar_accumulators",
    sql=fx.with_fixtures(
        """
    SELECT count(*)                                    AS n_archives,
           CAST(sum(duration) AS BIGINT)               AS total_duration,
           round(avg(duration), 4)                     AS avg_duration,
           CAST(count(transcript_object_key) AS BIGINT) AS n_transcribed
    FROM archives
    """,
        "archives",
    ),
    tags=("agg",),
)
def a5_scalar_accumulators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global counters: the reference's `new_recordings +=`, GPU-time
    totals and throughput ratio (cmdline.py:432-474, modal/recording.py
    :21-57) as one whole-table aggregate."""
    return fx.archives(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_archives"),
        F.sum("duration").cast("long").alias("total_duration"),
        F.round(F.avg("duration"), 4).alias("avg_duration"),
        F.count("transcript_object_key").cast("long").alias("n_transcribed"),
    )


# ---------------------------------------------------------------------------
# bench headline: TPC-H Q1-style pricing summary (agg throughput probe)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                            AS sum_qty,
           round(sum(l_extendedprice), 4)                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)    AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4)                            AS avg_qty,
           round(avg(l_extendedprice), 4)                       AS avg_price,
           round(avg(l_discount), 4)                            AS avg_disc,
           count(*)                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "bench", "latency"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the scan+hash-agg throughput
    probe for bench.py. Partial (map-side) aggregation collapses 600k
    rows to ~6 groups before the single tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# bench headline: shipping-priority style join+agg+topk
# ---------------------------------------------------------------------------


@query(
    "q3_order_revenue",
    sql="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "bench", "latency"),
)
def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join+agg+top-k: the multi-join throughput probe
    for bench.py. Join order is dimension-first: the segment-filtered
    customer broadcasts into orders, shrinking it ~5x BEFORE lineitem
    joins it — AQE then broadcasts the shrunk orders side at bench
    scale (no fact-table shuffle at all), and at 100 TB the same plan
    degrades gracefully to one shuffle of the pre-filtered join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_f = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    # Hint the SHRUNK side: without it Catalyst's static size estimate
    # broadcasts the 3-column lineitem scan (fact side) — fine at sf0.1,
    # an OOM at 100 TB. At cluster scale drop the hint and let AQE pick
    # SMJ vs broadcast from runtime sizes.
    return (
        li.join(F.broadcast(o_f), li.l_orderkey == o_f.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
