"""Flagship: the W1+A4+P8 occurrence-scan pipeline (SURVEY.md §7.1) —
stage 4 of the reference cron (modal/occurrence.py:78-131) re-hosted on
the documents-derived transcript/songs fixtures.

Two registrations:
- ``w1_flagship_occurrence_scan`` — the DEFAULT path, scoring with
  exact rapidfuzz ``fuzz.ratio`` semantics (normalized indel
  similarity, reference fuzz.py:26,36) via the Arrow-batched
  bit-parallel LCS pandas UDF. Fully DuckDB-oracle-checked: the oracle
  replays the SAME Allison–Dix bit-vector LCS recurrence on a 126-bit
  HUGEINT word (oracle_bits.lcs_expr), so windowing, short-page
  fallback, cross join, argmax tie-stability, threshold AND the exact
  scoring all hash-match.
- ``w1_lev_approx_scan`` — the JVM-codegen levenshtein approximation
  (100·(1−lev/(|a|+|b|)), which upper-bounds indel similarity); kept
  as the cheap non-UDF path and oracle-checked against DuckDB's
  ``levenshtein``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.functions.similarity import levenshtein_sum_ratio
from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
from firefly_vcut_spark.oracle_bits import indel_ratio_expr
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources import fixtures as fx

# The oracle window frame bound must be a literal: the fixture's
# max k is 3 (songs k = 1 + (doc_id//91) % 3 — sources/fixtures.py).
_FIXTURE_MAX_K = 3

_SKELETON = f"""
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
"""

_TAIL = """
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
"""

# Exact-indel scoring: the oracle computes the identical bit-parallel
# LCS the engine's pandas UDF runs (same recurrence, same 200·L/(la+lb)
# double arithmetic), entirely in DuckDB SQL over HUGEINTs.
_FLAGSHIP_SQL = fx.with_fixtures(
    _SKELETON
    + f"""
    , scored AS (
        SELECT s.song_id, w.doc_id, w.page, w.seg_idx, w.start,
               {indel_ratio_expr('s.lyrics_fragment', 'w.wtext')} AS score
        FROM winks w JOIN songs_k s ON s.k = w.k
    )
    """
    + _TAIL,
    "segments",
    "songs",
)

_LEV_SQL = fx.with_fixtures(
    _SKELETON
    + """
    , scored AS (
        SELECT s.song_id, w.doc_id, w.page, w.seg_idx, w.start,
               100.0 * (1.0 - CAST(levenshtein(s.lyrics_fragment, w.wtext) AS DOUBLE)
                        / greatest(length(s.lyrics_fragment) + length(w.wtext), 1)) AS score
        FROM winks w JOIN songs_k s ON s.k = w.k
    )
    """
    + _TAIL,
    "segments",
    "songs",
)


@query("w1_flagship_occurrence_scan", sql=_FLAGSHIP_SQL, tags=("flagship", "window", "fuzzy", "bench"))
def w1_flagship_occurrence_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 sliding-window fuzzy scan, end to end, with the reference's
    exact scoring: one window pass assembles all k-windows (incl.
    whole-page fallback for short pages), broadcast-joins the songs dim
    on k, scores with exact indel similarity (rapidfuzz ``fuzz.ratio``
    parity — fuzz.py:26,36 — bit-parallel LCS pandas UDF), keeps the
    tie-stable best window per (song, transcript), and applies the ≥40
    threshold (fuzz.py:3-43, cmdline.py:322-335)."""
    return fuzzy_occurrence_scan(
        fx.segments(spark, sf_dir), fx.songs(spark, sf_dir)
    )


@query("w1_lev_approx_scan", sql=_LEV_SQL, tags=("flagship", "window", "fuzzy"))
def w1_lev_approx_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline with the JVM levenshtein-ratio approximation
    (whole-stage codegen, no Python): the cheap scorer for scans where
    indel exactness isn't required. lev_ratio ≥ indel_ratio, so the
    threshold-40 pass set is a superset of the flagship's."""
    return fuzzy_occurrence_scan(
        fx.segments(spark, sf_dir),
        fx.songs(spark, sf_dir),
        scorer=levenshtein_sum_ratio,
    )


# Fixed-catalog variant (r9, verdict task 5): the registry fixture
# derives songs from the SAME documents table as the transcripts, so
# at sfN both sides grow and the scored-pair count is quadratic in SF
# by construction (14.7k output rows at sf0.1 → 1.47M at sf1) — a
# fixture artifact, not an engine property. A real deployment scans a
# growing corpus against a FIXED catalog; this query pins the catalog
# to the sf0.1 doc_id tile (song_id < 5000 — doc_ids are 0-based
# prefixes at every SF, so the cap selects the same 55 songs at sf0.3,
# sf1, and sf10 while only the transcript side scales). The flagship's
# linear-in-corpus claim (alpha 0.65, previously tools/w1_scale_probe)
# now rests on an oracle-checked registry query. At sf ≤ 0.1 the cap
# is non-binding (max doc_id 4999), so the gate-scale oracle checks
# the identical windowed-scan machinery on the full fixture catalog.
_FIXED_CATALOG_CAP = 5000

_FIXED_SQL = _FLAGSHIP_SQL.replace(
    "WHERE lyrics_fragment IS NOT NULL AND lyrics_fragment <> ''",
    f"WHERE song_id < {_FIXED_CATALOG_CAP} "
    "AND lyrics_fragment IS NOT NULL AND lyrics_fragment <> ''",
)
# str.replace silently no-ops if the skeleton's WHERE text drifts, and
# at gate scale the cap is non-binding so no test would notice — the
# oracle would quietly revert to the unfiltered catalog (ADVICE r9).
# Fail at import time instead.
assert _FIXED_SQL != _FLAGSHIP_SQL, (
    "w1_fixed_catalog oracle: catalog-cap substitution did not apply"
)


@query("w1_fixed_catalog", sql=_FIXED_SQL, tags=("flagship", "window", "fuzzy", "scale"))
def w1_fixed_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 scan against a FIXED song catalog (song_id < 5000, the sf0.1
    tile): the production-shaped scaling query — corpus grows, catalog
    doesn't — whose sf1/sf10 walls carry the flagship's linear-scaling
    claim (SCALING.md §sf10). Same exact-indel scoring, windowing,
    argmax, and threshold as w1_flagship_occurrence_scan."""
    return fuzzy_occurrence_scan(
        fx.segments(spark, sf_dir),
        fx.songs(spark, sf_dir).filter(F.col("song_id") < _FIXED_CATALOG_CAP),
    )
