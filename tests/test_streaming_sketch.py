"""Streaming KMV sketch sink: stream-folded state equals the batch
sketch regardless of micro-batching, and re-running a drained stream
(idempotent merge) leaves the state unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.sketches import kmv_bottom_k
from firefly_vcut_spark.sources.catalog import load_table
from firefly_vcut_spark.streaming.incremental import write_kmv_sketch_sink


def _stream_events_in_batches(spark, sf_dir, tmp_path, n_files=4):
    """Re-lay the events table as n_files parquet files so
    maxFilesPerTrigger=1 yields n_files micro-batches."""
    src = str(tmp_path / "ev_parts")
    load_table(spark, sf_dir, "events").repartition(n_files).write.parquet(src)
    schema = load_table(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streamed_sketch_equals_batch_sketch(spark, sf_dir, tmp_path):
    stream = _stream_events_in_batches(spark, sf_dir, tmp_path)
    path = write_kmv_sketch_sink(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    streamed = {
        r["event_type"]: r["kmv"] for r in spark.read.parquet(path).collect()
    }
    batch = {
        r["event_type"]: r["kmv"]
        for r in kmv_bottom_k(
            load_table(spark, sf_dir, "events"), "event_type", "user_id"
        ).collect()
    }
    assert streamed == batch


def test_rerun_after_drain_is_idempotent(spark, sf_dir, tmp_path):
    stream = _stream_events_in_batches(spark, sf_dir, tmp_path)
    store = str(tmp_path / "store")
    p1 = write_kmv_sketch_sink(stream, store, str(tmp_path / "ck1"))
    s1 = {r["event_type"]: r["kmv"] for r in spark.read.parquet(p1).collect()}
    # NEW checkpoint: every batch re-delivers against existing state
    stream2 = _stream_events_in_batches(spark, sf_dir, tmp_path / "again")
    p2 = write_kmv_sketch_sink(stream2, store, str(tmp_path / "ck2"))
    s2 = {r["event_type"]: r["kmv"] for r in spark.read.parquet(p2).collect()}
    assert s1 == s2
