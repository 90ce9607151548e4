"""Randomized engine-vs-port equivalence for the flagship scan:
~40 seeded random transcripts (varied page shapes, repeated tokens,
degenerate one-word segments) × random needles (k 1..4) — every
(song, transcript) argmax must match the Python port exactly."""

from __future__ import annotations

import random

from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
from tests.fuzz_port import best_match, dp_indel_ratio

VOCAB = ["spark", "join", "scan", "merge", "sort", "agg", "la", "na", "hum", "x"]


def _gen(seed: int = 7, n_docs: int = 40, n_songs: int = 8):
    rng = random.Random(seed)
    transcripts = {}
    for d in range(n_docs):
        n_pages = rng.randint(1, 3)
        pages = []
        for _ in range(n_pages):
            n_segs = rng.randint(1, 7)
            pages.append(
                [
                    " ".join(rng.choices(VOCAB, k=rng.randint(1, 5)))
                    for _ in range(n_segs)
                ]
            )
        transcripts[d] = pages
    songs = {}
    for s in range(n_songs):
        k = rng.randint(1, 4)
        if rng.random() < 0.5 and s < n_docs:
            # planted: consecutive segments of some transcript
            pages = transcripts[s]
            page = rng.choice(pages)
            j = rng.randrange(len(page))
            lines = page[j : j + k]
        else:
            lines = [
                " ".join(rng.choices(VOCAB, k=rng.randint(1, 4))) for _ in range(k)
            ]
        songs[s] = "\n".join(lines)
    return transcripts, songs


def test_engine_equals_port_on_random_transcripts(spark):
    transcripts, songs = _gen()
    seg_rows = [
        (d, p + 1, i, float(i * 3), text)
        for d, pages in transcripts.items()
        for p, page in enumerate(pages)
        for i, text in enumerate(page)
    ]
    segs = spark.createDataFrame(
        seg_rows, "doc_id long, page int, seg_idx int, start double, text string"
    )
    songs_df = spark.createDataFrame(
        [(s, f"song-{s}", ly) for s, ly in songs.items()],
        "song_id long, title string, lyrics_fragment string",
    )
    got = {
        (r.song_id, r.doc_id): (r.start, r.page, r.seg_idx, r.score)
        for r in fuzzy_occurrence_scan(segs, songs_df, threshold=0.0).collect()
    }
    checked = 0
    for sid, ly in songs.items():
        for d, pages in transcripts.items():
            nested = [
                [{"start": float(i * 3), "text": t} for i, t in enumerate(page)]
                for page in pages
            ]
            exp = best_match(ly, nested, dp_indel_ratio)
            assert exp is not None
            score, start, page, seg_idx = exp
            g = got[(sid, d)]
            assert g[:3] == (int(start), page, seg_idx), (sid, d, g, exp)
            assert abs(g[3] - round(score, 4)) < 1e-3, (sid, d, g, exp)
            checked += 1
    assert checked == len(songs) * len(transcripts)
