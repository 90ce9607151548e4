"""The signature operator: sliding-window fuzzy text scan (W1).

Reference semantics (fuzz.py:3-43, restated — not ported):
for each (song, transcript) pair, slide a window of
k = line-count(lyrics) consecutive segments down every page; score the
newline-joined window text against the lyrics; pages shorter than k
are scored once, whole; keep the single best-scoring window per pair
(first window wins ties: strict ``>`` in the reference's running max,
i.e. order (score desc, page asc, seg_idx asc)); report the start of
the window's first segment and the 1-based page.

Spark-first design for 100 TB:
- ONE window pass assembles all window texts: ``collect_list(text)``
  over ``rowsBetween(0, max_k-1)`` partitioned by (transcript, page) —
  no per-song re-assembly, no self-join. max_k is discovered from the
  songs dim with a tiny aggregate job (songs is the small side).
- Windows are then exploded once per *distinct* k (few: lyric
  fragments are short) and equi-joined to ``broadcast(songs)`` on k —
  the scored-pair count is segments×songs, but window-text assembly is
  amortized to segments×distinct_k.
- Default scoring is the exact-indel pandas UDF (reference
  ``fuzz.ratio`` parity, Arrow-batched bit-parallel LCS); the JVM
  levenshtein codegen scorer is the drop-in cheap approximation.
- Argmax is a partial-aggregating ``max_by`` on an ordering-encoding
  struct — no global sort, no row_number window over the scored set.

Empty transcripts yield no row (documented deviation: the reference
crashes on them — fuzz.py:43, SURVEY §7.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from firefly_vcut_spark.functions.similarity import (
    indel_ratio_udf,
    levenshtein_sum_ratio,
)

Scorer = Callable[[Column, Column], Column]

DEFAULT_THRESHOLD = 40.0  # reference cmdline.py:204-209 ("score >= 40 passes")


def indel_scorer(a: Column, b: Column) -> Column:
    """Default scorer: exact rapidfuzz ``fuzz.ratio`` semantics
    (normalized indel similarity — fuzz.py:26,36) via the Arrow-batched
    bit-parallel LCS pandas UDF. This is the reference-parity path; the
    JVM ``levenshtein_sum_ratio`` remains available as the cheaper
    codegen approximation (it upper-bounds indel, so thresholds only
    loosen)."""
    return indel_ratio_udf(a, b)


def count_lines(col: Column) -> Column:
    """k = number of newline-separated lines (fuzz.py:21)."""
    return F.size(F.split(col, "\n"))


def prepare_songs(songs: DataFrame, lyrics_col: str = "lyrics_fragment") -> DataFrame:
    """Filter to matchable songs (P5: non-null, non-empty lyrics —
    dblocal.py:77-81) and attach k."""
    c = F.col(lyrics_col)
    return songs.filter(c.isNotNull() & (c != "")).withColumn("k", count_lines(c))


def assemble_windows(
    segments: DataFrame,
    ks: list[int],
    id_col: str = "doc_id",
) -> DataFrame:
    """All candidate windows for every k in ``ks``, one window pass.

    Input: one row per segment (id, page, seg_idx, start, text).
    Output: (id, page, seg_idx, start, k, wtext) — full windows where
    the page has ≥ k segments (only positions with a complete window,
    mirroring the reference's ``range(len-k+1)`` slide), plus the
    whole-page fallback row at seg_idx 0 for pages shorter than k.
    """
    max_k = max(ks)
    by_page = Window.partitionBy(id_col, "page").orderBy("seg_idx")
    page_part = Window.partitionBy(id_col, "page")
    w = (
        segments.withColumn(
            "wlist", F.collect_list("text").over(by_page.rowsBetween(0, max_k - 1))
        )
        .withColumn("page_len", F.count(F.lit(1)).over(page_part))
        .withColumn(
            "page_text",
            F.array_join(
                F.collect_list("text").over(
                    by_page.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
                "\n",
            ),
        )
    )
    w = w.withColumn("k", F.explode(F.array(*[F.lit(k) for k in sorted(set(ks))])))
    valid = (
        (F.col("page_len") >= F.col("k"))
        & (F.col("seg_idx") <= F.col("page_len") - F.col("k"))
    ) | ((F.col("page_len") < F.col("k")) & (F.col("seg_idx") == 0))
    return w.filter(valid).select(
        id_col,
        "page",
        "seg_idx",
        "start",
        "k",
        F.when(F.col("page_len") < F.col("k"), F.col("page_text"))
        .otherwise(F.array_join(F.slice("wlist", 1, F.col("k")), "\n"))
        .alias("wtext"),
    )


def best_window_per_pair(scored: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Tie-stable argmax per (song, transcript): highest score, then
    earliest (page, seg_idx) — the reference's strict-``>`` running max
    (fuzz.py:27,37). Implemented as ``max_by`` on an ordering struct
    (score, -page, -seg_idx) so aggregation stays partial/map-side;
    no window-function sort of the full scored set."""
    ordering = F.struct(
        F.col("score"),
        (-F.col("page")).alias("neg_page"),
        (-F.col("seg_idx")).alias("neg_idx"),
    )
    # payload carries only the reported columns — NOT wtext: the window
    # text is the fat column, and keeping it in the max_by struct would
    # drag every window's text through the partial-agg sort and the
    # (song, doc) exchange just to be dropped by the caller
    payload = F.struct("score", "page", "seg_idx", "start")
    return (
        scored.groupBy("song_id", id_col)
        .agg(F.max_by(payload, ordering).alias("best"))
        .select(
            "song_id",
            id_col,
            F.col("best.score").alias("score"),
            F.col("best.page").alias("page"),
            F.col("best.seg_idx").alias("seg_idx"),
            F.col("best.start").alias("start"),
        )
    )


def fuzzy_occurrence_scan(
    segments: DataFrame,
    songs: DataFrame,
    scorer: Scorer = indel_scorer,
    threshold: float = DEFAULT_THRESHOLD,
    id_col: str = "doc_id",
    lyrics_col: str = "lyrics_fragment",
) -> DataFrame:
    """Full W1 pipeline: windows × broadcast(songs) → score → argmax →
    threshold (fuzz.py:3-43 + cmdline.py:322-335 semantics).

    Returns (song_id, <id_col>, start, page, seg_idx, score).
    """
    sg = prepare_songs(songs, lyrics_col)
    ks = [r["k"] for r in sg.select("k").distinct().collect()]
    if not ks:
        raise ValueError("no matchable songs: all lyrics null/empty")
    # Scoring is CPU-bound, not size-bound: AQE coalesces the tiny
    # window shuffle (<1 MB) to one partition, which would serialize
    # the scoring fan-out on one core. Pre-partitioning the SEGMENTS on
    # the window keys at full parallelism makes that one exchange both
    # the parallelism pin (AQE respects user repartition counts) AND
    # the window's required distribution — the assembled windows then
    # flow straight into the broadcast join + scorer with no second
    # exchange of exploded window TEXT (the old round-robin repartition
    # shuffled k x segments rows of wtext payload).
    segments = segments.repartition(
        segments.sparkSession.sparkContext.defaultParallelism, id_col, "page"
    )
    windows = assemble_windows(segments, ks, id_col)
    # Considered and rejected: pruning pairs with the JVM lev bound
    # (lev_ratio >= indel_ratio) before the pandas UDF. The bound is
    # provably emitted-rows-exact at threshold-0.001, but measured
    # selectivity on real window/lyric pairs is ~1% (lev-sum ratio is
    # generous on short shared-vocabulary strings), so it adds a full
    # JVM scoring pass to save ~1% of Arrow traffic.
    scored = windows.join(F.broadcast(sg), "k").withColumn(
        "score", scorer(F.col(lyrics_col), F.col("wtext"))
    )
    best = best_window_per_pair(scored, id_col)
    return best.filter(F.col("score") >= threshold).select(
        "song_id",
        id_col,
        F.col("start").cast("long").alias("start"),
        F.col("page").cast("long").alias("page"),
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.round("score", 4).alias("score"),
    )
