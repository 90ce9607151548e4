"""W1 operator tests: bit-parallel LCS vs DP (hypothesis), and the
full engine pipeline vs the Python port of the reference algorithm on
the real fixture — both scorers."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from firefly_vcut_spark.functions.similarity import indel_ratio, lcs_length
from firefly_vcut_spark.operators.fuzzy import DEFAULT_THRESHOLD, fuzzy_occurrence_scan
from firefly_vcut_spark.sources import fixtures as fx
from tests.fuzz_port import (
    best_match,
    dp_indel_ratio,
    dp_lcs,
    lev_sum_ratio,
)

texts = st.text(alphabet="ab cdN\n", max_size=60)


@given(texts, texts)
@settings(max_examples=300, deadline=None)
def test_bit_parallel_lcs_matches_dp(a, b):
    assert lcs_length(a, b) == dp_lcs(a, b)


@given(texts, texts)
@settings(max_examples=100, deadline=None)
def test_indel_ratio_matches_dp(a, b):
    assert indel_ratio(a, b) == pytest.approx(dp_indel_ratio(a, b))


def _collect_transcripts(spark, sf_dir):
    segs = fx.segments(spark, sf_dir).collect()
    pages: dict[int, dict[int, list]] = {}
    for r in segs:
        pages.setdefault(r.doc_id, {}).setdefault(r.page, []).append(r)
    out = {}
    for doc_id, pg in pages.items():
        out[doc_id] = [
            [
                {"start": s.start, "text": s.text}
                for s in sorted(pg[p], key=lambda s: s.seg_idx)
            ]
            for p in sorted(pg)
        ]
    return out


def _port_expected(spark, sf_dir, scorer):
    songs = {
        r.song_id: r.lyrics_fragment
        for r in fx.songs(spark, sf_dir).collect()
        if r.lyrics_fragment  # P5: null/empty excluded
    }
    transcripts = _collect_transcripts(spark, sf_dir)
    expected = {}
    for song_id, lyrics in songs.items():
        for doc_id, pages in transcripts.items():
            got = best_match(lyrics, pages, scorer)
            if got is not None and got[0] >= DEFAULT_THRESHOLD:
                score, start, page, seg_idx = got
                expected[(song_id, doc_id)] = (
                    int(start),
                    page,
                    seg_idx,
                    round(score, 4),
                )
    return expected


@pytest.mark.parametrize(
    "engine_scorer,port_scorer",
    [
        pytest.param("lev", lev_sum_ratio, id="levenshtein"),
        pytest.param(None, dp_indel_ratio, id="indel"),
    ],
)
def test_engine_matches_reference_port(spark, sf_dir, engine_scorer, port_scorer):
    segs = fx.segments(spark, sf_dir)
    songs = fx.songs(spark, sf_dir)
    if engine_scorer == "lev":
        from firefly_vcut_spark.functions.similarity import levenshtein_sum_ratio

        df = fuzzy_occurrence_scan(segs, songs, scorer=levenshtein_sum_ratio)
    else:
        # default path = exact indel (reference fuzz.ratio parity)
        df = fuzzy_occurrence_scan(segs, songs)
    got = {
        (r.song_id, r.doc_id): (r.start, r.page, r.seg_idx, r.score)
        for r in df.collect()
    }
    expected = _port_expected(spark, sf_dir, port_scorer)
    assert got.keys() == expected.keys()
    for key in expected:
        g, e = got[key], expected[key]
        assert g[:3] == e[:3], f"{key}: engine={g} port={e}"
        assert g[3] == pytest.approx(e[3], abs=1e-3), f"{key}: engine={g} port={e}"


def test_empty_songs_raises(spark, sf_dir):
    empty = fx.songs(spark, sf_dir).filter("lyrics_fragment = '__nope__'")
    with pytest.raises(ValueError, match="no matchable songs"):
        fuzzy_occurrence_scan(fx.segments(spark, sf_dir), empty)
