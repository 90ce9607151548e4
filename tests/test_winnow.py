"""Winnowing fingerprint properties: the paper's two guarantees
(match guarantee + density) and the pair-scan behavior on planted
overlaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.text import winnow_fingerprints

K, W = 8, 4


def _fp_hashes(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = winnow_fingerprints(df, "text", "doc_id", K, W)
    return {
        r["doc_id"]: {x["h"] for x in r["fps"]} for r in out.collect()
    }


def test_match_guarantee_shared_substring(spark):
    """Any shared substring of length >= k + w - 1 (= 11) must yield
    at least one shared fingerprint, regardless of its position in
    either document."""
    shared = "zqxjvkwpbyfmg"  # 13 alnum chars > 11
    rows = [
        (1, f"aaaa {shared} bbbb cccc dddd eeee"),
        (2, f"totally different prefix text here {shared}"),
        (3, "no overlap with anything else at all today"),
    ]
    fps = _fp_hashes(spark, rows)
    assert fps[1] & fps[2], "planted shared substring produced no shared fingerprint"
    assert not (fps[1] & fps[3] & fps[2] & fps[3])


def test_density_bound(spark):
    """Selected positions per doc stay near the 2/(w+1) density the
    paper proves for random text (loose band: [1/w, 3/(w+1)])."""
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(2000))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = (
        winnow_fingerprints(df, "text", "doc_id", K, W)
        .select("n_grams", F.size("fps").alias("n_fps"))
        .collect()[0]
    )
    density = row["n_fps"] / row["n_grams"]
    assert 1 / W <= density <= 3 / (W + 1), density


def test_position_shift_invariance_of_interior_fingerprints(spark):
    """Winnowing is local: shifting a document by a prefix changes
    positions but the interior fingerprint HASH set still overlaps
    heavily (here: the shifted copy shares every original hash)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, "zzzz yyyy xxxx " + base)]
    fps = _fp_hashes(spark, rows)
    assert fps[1] <= fps[2]


def test_pair_scan_flags_planted_overlap(spark, sf_dir):
    """dedup_winnow_pairs finds at least one pair on the synthetic
    documents table (the generator plants near-duplicates), and every
    reported pair is ordered with a >=2 share count."""
    from firefly_vcut_spark.plans import all_queries

    q = all_queries()["dedup_winnow_pairs"]
    rows = q.fn(spark, sf_dir).collect()
    assert rows, "no winnow pairs found on the synthetic corpus"
    assert all(r["id_a"] < r["id_b"] and r["n_shared"] >= 2 for r in rows)


def test_passage_chunks_cover_and_overlap(spark, sf_dir):
    """Chunking invariants on the real corpus: per doc, chunk 0
    starts at token 1, consecutive chunks advance by the stride (so
    interior overlap = window - stride), full chunks are
    window-sized, and total coverage reaches the last token."""
    from pyspark.sql import functions as F

    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.plans.winnow_sql import _CS, _CW

    rows = (
        all_queries()["corpus_passage_chunks"]
        .fn(spark, sf_dir)
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c["n_tokens"] == _CW, (doc, c)  # only the tail is short
        tail = chunks[-1]
        assert 1 <= tail["n_tokens"] <= _CW
        # starts are stride-spaced from 1 and the tail ends at token
        # n, so coverage is gapless; count matches 1 + ceil((n-W)/S)
        n = tail["chunk_idx"] * _CS + tail["n_tokens"]
        assert len(chunks) == 1 + (max(n - _CW, 0) + _CS - 1) // _CS
        if len(chunks) > 1:
            assert tail["n_tokens"] > _CW - _CS  # tail adds new tokens


def test_udtf_chunker_agrees_with_column_chunker(spark, sf_dir):
    """The Python UDTF (LATERAL table function) and the pure-Column
    production chunker emit identical (doc, chunk, token-count)
    triples."""
    from firefly_vcut_spark.functions.passages import register
    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.sources.catalog import register_views

    register(spark)
    register_views(spark, sf_dir)
    udtf_rows = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in spark.sql(
            "SELECT d.doc_id, p.chunk_idx, p.n_tokens "
            "FROM documents d, LATERAL split_passages(d.text) p"
        ).collect()
    }
    col_rows = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in all_queries()["corpus_passage_chunks"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert udtf_rows == col_rows
