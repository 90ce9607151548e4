"""Streaming inverted-index sink: the merge-on-read index over
segment-appended posting deltas equals the batch-built index no matter
how the corpus was micro-batched; ingest writes O(batch) bytes per
batch; re-delivery is idempotent."""

from __future__ import annotations

import os

from firefly_vcut_spark.operators.text import merge_postings, postings_delta
from firefly_vcut_spark.sources.catalog import load_table
from firefly_vcut_spark.streaming.incremental import (
    read_inverted_index,
    write_inverted_index_sink,
)


def _stream_docs(spark, sf_dir, tmp_path, n_files=4):
    src = str(tmp_path / "doc_parts")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(n_files).write.parquet(src)
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _index_map(df):
    return {
        r["term"]: (r["df"], r["cf"], tuple(r["post"])) for r in df.collect()
    }


def test_streamed_index_equals_batch_index(spark, sf_dir, tmp_path):
    stream = _stream_docs(spark, sf_dir, tmp_path)
    root = write_inverted_index_sink(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    streamed = _index_map(read_inverted_index(spark, root))
    batch = _index_map(
        merge_postings(postings_delta(load_table(spark, sf_dir, "documents")))
    )
    assert streamed == batch and len(batch) > 0


def test_index_ingest_writes_o_batch_segments(spark, sf_dir, tmp_path):
    """EVERY micro-batch — including the first — lands as ONE tagged
    segment dir over a one-time empty schema-bearing base, so no
    batch's rows ever ride an untagged write (an untagged first batch
    redelivered after a crash would double-count cf); the base is
    written once and never rewritten (no write-amplification: bytes
    on disk grow by ~delta per batch)."""
    stream = _stream_docs(spark, sf_dir, tmp_path, n_files=4)
    root = write_inverted_index_sink(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    tdir = os.path.join(root, "postings")
    bases = [n for n in os.listdir(tdir) if n.startswith("v")]
    segs = [n for n in os.listdir(tdir) if n.startswith("s")]
    assert bases == ["v1"]
    assert len(segs) == 4  # batches 1..4, all tagged


def test_index_crash_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """Crash simulation: drop the checkpoint's LAST batch commit after
    a full drain, then restart the query from the same checkpoint —
    Structured Streaming re-delivers that batch under its original
    batch id, the same-tag append is skipped, and the index (cf
    included — the one field a duplicated delta would corrupt) is
    unchanged."""
    ck = str(tmp_path / "ck1")
    stream = _stream_docs(spark, sf_dir, tmp_path)
    root = str(tmp_path / "store")
    write_inverted_index_sink(stream, root, ck)
    s1 = _index_map(read_inverted_index(spark, root))
    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    # same checkpoint, same source: the uncommitted final batch re-delivers
    src = str(tmp_path / "doc_parts")
    docs_schema = load_table(spark, sf_dir, "documents").schema
    replay = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    write_inverted_index_sink(replay, root, ck)
    s2 = _index_map(read_inverted_index(spark, root))
    assert s1 == s2


def test_index_batch_zero_redelivery_does_not_double_count_cf(
    spark, sf_dir, tmp_path
):
    """The ADVICE-flagged crash window: the FIRST batch's store commit
    lands but the checkpoint commit does not — Structured Streaming
    re-delivers batch 0 on restart. With the all-tagged discipline the
    re-append is a no-op, so cf (the one SUMMED field a duplicated
    delta corrupts — doc-id sets would collapse in merge_postings)
    stays exact."""
    ck = str(tmp_path / "ck0")
    src = str(tmp_path / "doc_parts0")
    docs = load_table(spark, sf_dir, "documents")
    docs.coalesce(1).write.parquet(src)  # ONE file -> ONE batch (id 0)
    root = str(tmp_path / "store0")

    def one_batch_stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    write_inverted_index_sink(one_batch_stream(), root, ck)
    s1 = _index_map(read_inverted_index(spark, root))
    # crash between store commit and checkpoint commit of batch 0
    os.remove(os.path.join(ck, "commits", "0"))
    crc = os.path.join(ck, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    write_inverted_index_sink(one_batch_stream(), root, ck)
    s2 = _index_map(read_inverted_index(spark, root))
    assert s1 == s2 and len(s1) > 0
