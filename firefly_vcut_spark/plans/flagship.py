"""Flagship: the W1+A4+P8 occurrence-scan pipeline (SURVEY.md §7.1) —
stage 4 of the reference cron (modal/occurrence.py:78-131) re-hosted on
the documents-derived transcript/songs fixtures.

Two registrations:
- ``w1_flagship_occurrence_scan`` — JVM levenshtein scoring, fully
  DuckDB-oracle-checked (windowing, short-page fallback, cross join,
  argmax tie-stability, threshold — the whole skeleton).
- ``w1_exact_indel_scan`` — exact rapidfuzz-semantics indel scoring
  via the bit-parallel pandas UDF; not SQL-expressible (rows-only for
  the driver), engine-verified by property tests vs a straight-DP
  reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from firefly_vcut_spark.functions.similarity import indel_ratio_udf
from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx

# The oracle window frame bound must be a literal: the fixture's
# max k is 3 (songs k = 1 + (doc_id//91) % 3 — sources/fixtures.py).
_FIXTURE_MAX_K = 3

_FLAGSHIP_SQL = fx.with_fixtures(
    f"""
    , songs_k AS (
        SELECT song_id, lyrics_fragment,
               len(string_split(lyrics_fragment, chr(10))) AS k
        FROM songs
        WHERE lyrics_fragment IS NOT NULL AND lyrics_fragment <> ''
    )
    , win AS (
        SELECT doc_id, page, seg_idx, start,
               count(*) OVER (PARTITION BY doc_id, page) AS page_len,
               list(text) OVER (PARTITION BY doc_id, page ORDER BY seg_idx
                   ROWS BETWEEN CURRENT ROW AND {_FIXTURE_MAX_K - 1} FOLLOWING) AS wlist,
               string_agg(text, chr(10)) OVER (PARTITION BY doc_id, page ORDER BY seg_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS page_text
        FROM segments
    )
    , ks AS (SELECT DISTINCT k FROM songs_k)
    , winks AS (
        SELECT w.doc_id, w.page, w.seg_idx, w.start, ks.k,
               CASE WHEN w.page_len < ks.k THEN w.page_text
                    ELSE array_to_string(w.wlist[1:CAST(ks.k AS INTEGER)], chr(10))
               END AS wtext
        FROM win w CROSS JOIN ks
        WHERE (w.page_len >= ks.k AND w.seg_idx <= w.page_len - ks.k)
           OR (w.page_len < ks.k AND w.seg_idx = 0)
    )
    , scored AS (
        SELECT s.song_id, w.doc_id, w.page, w.seg_idx, w.start,
               100.0 * (1.0 - CAST(levenshtein(s.lyrics_fragment, w.wtext) AS DOUBLE)
                        / greatest(length(s.lyrics_fragment) + length(w.wtext), 1)) AS score
        FROM winks w JOIN songs_k s ON s.k = w.k
    )
    , best AS (
        SELECT *, row_number() OVER (PARTITION BY song_id, doc_id
                      ORDER BY score DESC, page ASC, seg_idx ASC) AS rn
        FROM scored
    )
    SELECT song_id, doc_id,
           CAST(start AS BIGINT)   AS start,
           CAST(page AS BIGINT)    AS page,
           CAST(seg_idx AS BIGINT) AS seg_idx,
           round(score, 4)         AS score
    FROM best WHERE rn = 1 AND score >= 40
    """,
    "segments",
    "songs",
)


@query("w1_flagship_occurrence_scan", sql=_FLAGSHIP_SQL, tags=("flagship", "window", "fuzzy", "bench"))
def w1_flagship_occurrence_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 sliding-window fuzzy scan, end to end: one window pass
    assembles all k-windows (incl. whole-page fallback for short
    pages), broadcast-joins the songs dim on k, scores JVM-side
    (levenshtein ratio), keeps the tie-stable best window per
    (song, transcript), and applies the ≥40 threshold
    (fuzz.py:3-43, cmdline.py:322-335)."""
    return fuzzy_occurrence_scan(
        fx.segments(spark, sf_dir), fx.songs(spark, sf_dir)
    )


@query("w1_exact_indel_scan", sql=None, tags=("flagship", "window", "fuzzy", "udf"))
def w1_exact_indel_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline with exact rapidfuzz `fuzz.ratio` semantics
    (normalized indel similarity) via the Arrow-batched bit-parallel
    LCS pandas UDF — the engine-exact scoring path (fuzz.py:26,36).
    Not SQL-expressible; property-tested against a straight DP."""
    return fuzzy_occurrence_scan(
        fx.segments(spark, sf_dir),
        fx.songs(spark, sf_dir),
        scorer=lambda a, b: indel_ratio_udf(a, b),
    )
