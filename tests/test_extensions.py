"""Extension-operator semantics tests beyond the oracle harness:
planted duplicates must be FOUND by every dedup path; multimodal
checksums must match a local hashlib computation; ANN bucketed recall
is sane."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from firefly_vcut_spark.plans import all_queries
from firefly_vcut_spark.sources.catalog import load_table

QS = all_queries()


def _planted_ids(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return {
        r.doc_id for r in d.filter(F.col("doc_id") % 17 == 0).select("doc_id").collect()
    }


def test_exact_dedup_finds_planted(spark, sf_dir):
    planted = _planted_ids(spark, sf_dir)
    rows = QS["dedup_exact"].fn(spark, sf_dir).collect()
    dup_groups = [r for r in rows if r.n_dups >= 2]
    assert {r.keep_id for r in dup_groups} == planted


def test_minhash_lsh_finds_planted(spark, sf_dir):
    planted = _planted_ids(spark, sf_dir)
    pairs = QS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    found = {
        (r.id_a, r.id_b) for r in pairs if r.n_shared_bands == 8
    }
    # every planted (orig, orig+1e6) pair shares all 8 bands
    assert {(p, p + 1000000) for p in planted} <= found


def test_simhash_finds_planted_at_hamming_zero(spark, sf_dir):
    planted = _planted_ids(spark, sf_dir)
    pairs = QS["dedup_simhash"].fn(spark, sf_dir).collect()
    zero = {(r.id_a, r.id_b) for r in pairs if r.hamming == 0}
    assert {(p, p + 1000000) for p in planted} <= zero


def test_mm_checksum_matches_hashlib(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").limit(2000).collect()
    }
    feats = QS["mm_decode_features"].fn(spark, sf_dir).collect()
    assert len(feats) == len(docs)
    for r in feats:
        raw = docs[r.doc_id].encode("utf-8")
        assert r.checksum == hashlib.md5(raw).hexdigest()
        assert r.n_bytes == len(raw)


def test_mm_frame_sample_shapes(spark, sf_dir):
    frames = QS["mm_frame_sample"].fn(spark, sf_dir)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)
    total_bytes = frames.agg(F.sum("frame_bytes")).collect()[0][0]
    assert total_bytes > 0


def test_ann_bucketed_is_subset_of_bruteforce_space(spark, sf_dir):
    """Bucketed top-k must return pairs whose cosine equals the
    brute-force cosine for the same pair (same scoring, smaller
    candidate set)."""
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in QS["ann_bruteforce_topk"].fn(spark, sf_dir).collect()
    }
    bk = QS["ann_lsh_bucketed_topk"].fn(spark, sf_dir).collect()
    assert bk, "bucketed ANN returned nothing"
    for r in bk:
        if (r.query_id, r.neighbor_id) in bf:
            assert bf[(r.query_id, r.neighbor_id)] == r.cos_sim
