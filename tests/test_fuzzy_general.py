"""Flagship generality beyond the fixture's k∈{1,2,3}: large k,
k > page length (whole-page fallback), k > whole transcript, and
single-segment pages — engine vs Python port on synthetic
transcripts."""

from __future__ import annotations

from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
from tests.fuzz_port import best_match, dp_indel_ratio


def _mk_segments(spark, transcripts: dict[int, list[list[str]]]):
    rows = []
    for doc_id, pages in transcripts.items():
        for p, segs in enumerate(pages, start=1):
            for i, text in enumerate(segs):
                rows.append((doc_id, p, i, float(10 * i), text))
    return spark.createDataFrame(
        rows, "doc_id long, page int, seg_idx int, start double, text string"
    )


def _mk_songs(spark, lyrics: dict[int, str]):
    return spark.createDataFrame(
        [(sid, f"song-{sid}", ly) for sid, ly in lyrics.items()],
        "song_id long, title string, lyrics_fragment string",
    )


def test_large_and_oversized_k(spark):
    transcripts = {
        1: [["alpha beta", "gamma delta", "epsilon zeta", "eta theta",
             "iota kappa", "lambda mu", "nu xi", "omicron pi"]],   # 8 segs
        2: [["one two", "three four"], ["five six"]],              # short pages
        3: [["solo segment"]],                                     # 1 seg
    }
    lyrics = {
        # k=5: planted exactly at doc 1 segs 2..6
        10: "epsilon zeta\neta theta\niota kappa\nlambda mu\nnu xi",
        # k=6 > every page of doc 2/3 → whole-page fallback everywhere
        11: "one two\nthree four\nfive six\nseven eight\nnine ten\nx y",
        # k=1 trivial
        12: "solo segment",
    }
    segs = _mk_segments(spark, transcripts)
    songs = _mk_songs(spark, lyrics)
    got = {
        (r.song_id, r.doc_id): (r.start, r.page, r.seg_idx, r.score)
        for r in fuzzy_occurrence_scan(segs, songs, threshold=0.0).collect()
    }
    for sid, ly in lyrics.items():
        for doc_id, pages in transcripts.items():
            nested = [
                [{"start": float(10 * i), "text": t} for i, t in enumerate(p)]
                for p in pages
            ]
            exp = best_match(ly, nested, dp_indel_ratio)
            assert exp is not None
            score, start, page, seg_idx = exp
            g = got[(sid, doc_id)]
            assert g[:3] == (int(start), page, seg_idx), (sid, doc_id, g, exp)
            assert abs(g[3] - round(score, 4)) < 1e-3
    # the planted k=5 window is an exact hit
    assert got[(10, 1)] == (20, 1, 2, 100.0)
    # k=1 exact on the single-segment doc
    assert got[(12, 3)] == (0, 1, 0, 100.0)
