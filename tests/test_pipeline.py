"""End-to-end pipeline composition: the four cron stages drain the
state machine, produce occurrences, and are idempotent across ticks."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.pipeline import Warehouse, run_pipeline
from firefly_vcut_spark.sources import fixtures as fx


def _queue_counts(wh: Warehouse) -> dict[str, int]:
    a = wh.read("archives")
    return {
        "needs_streaming": a.filter(
            (F.col("audio_object_keys").isNull() | (F.size("audio_object_keys") == 0))
            & F.col("transcript_object_key").isNull()
        ).count(),
        "needs_transcription": a.filter(
            F.col("audio_object_keys").isNotNull()
            & (F.size("audio_object_keys") > 0)
            & F.col("transcript_object_key").isNull()
        ).count(),
        "needs_scan": a.filter(
            F.col("transcript_object_key").isNotNull()
            & F.col("last_song_occurrence_scan").isNull()
        ).count(),
    }


def test_pipeline_tick_advances_state_machine(spark, sf_dir, tmp_path):
    root = str(tmp_path / "wh")
    wh0_counts = None

    # tick 1: bootstraps, streams 10, transcribes the pre-staged queue,
    # scans the pre-staged transcripts
    r1 = run_pipeline(spark, sf_dir, root, stream_limit=10)
    wh = Warehouse(spark, root)
    c1 = _queue_counts(wh)
    assert r1.streamed == 10
    assert r1.transcribed > 0
    assert r1.occurrences > 0
    assert c1["needs_scan"] == 0  # stage 4 drains its whole queue

    # tick 2: the 10 streamed archives flow onward; no rescans of
    # already-scanned archives
    occ_before = wh.read("occurrences").count()
    r2 = run_pipeline(spark, sf_dir, root, stream_limit=10)
    wh = Warehouse(spark, root)
    c2 = _queue_counts(wh)
    assert r2.discovered == 0
    assert c2["needs_streaming"] == c1["needs_streaming"] - 10 + 0 or r2.streamed <= 10
    assert c2["needs_scan"] == 0
    # occurrences grow monotonically (upsert, never delete)
    assert wh.read("occurrences").count() >= occ_before
    wh0_counts = c2

    # tick 3 with an incoming discovery batch outside the watermark
    incoming = (
        fx.archives(spark, sf_dir)
        .orderBy(F.desc("pubdate"))
        .limit(3)
        .withColumn("bvid", F.concat(F.lit("BVnew"), F.col("bvid")))
        .withColumn("id", F.col("id") + 5_000_000)
        .withColumn("pubdate", F.col("pubdate") + 10_000_000)
        .withColumn("audio_object_keys", F.lit(None).cast("array<string>"))
        .withColumn("transcript_object_key", F.lit(None).cast("string"))
        .withColumn("last_song_occurrence_scan", F.lit(None).cast("timestamp"))
    )
    r3 = run_pipeline(spark, sf_dir, root, incoming=incoming)
    assert r3.discovered == 3
    # re-discovering the same batch is a no-op (first-writer-wins)
    r4 = run_pipeline(spark, sf_dir, root, incoming=incoming)
    assert r4.discovered == 0
    assert wh0_counts is not None


def test_backfill_ignores_scan_marks_and_upserts(spark, sf_dir, tmp_path):
    """Backfill re-scans already-scanned archives for one song (force
    update) and only touches that song's rows."""
    from pyspark.sql import functions as F

    from firefly_vcut_spark.pipeline import backfill_occurrences

    root = str(tmp_path / "whbf")
    run_pipeline(spark, sf_dir, root)
    wh = Warehouse(spark, root)
    occ = wh.read("occurrences")
    song_id = occ.select("song_id").first().song_id
    before_other = occ.filter(F.col("song_id") != song_id).count()

    n = backfill_occurrences(wh, fx.songs(spark, sf_dir), song_id, latest_n=50)
    assert n > 0  # rescans despite last_song_occurrence_scan being set
    wh2 = Warehouse(spark, root)
    after = wh2.read("occurrences")
    assert after.filter(F.col("song_id") != song_id).count() == before_other
    # idempotent: backfilling again changes nothing
    n2 = backfill_occurrences(wh2, fx.songs(spark, sf_dir), song_id, latest_n=50)
    assert n2 == n
    assert Warehouse(spark, root).read("occurrences").count() == after.count()


def test_transcribe_kernel_matches_segment_fixture(spark, sf_dir, tmp_path):
    """The U1 stub must produce the same segmentation as the segments
    fixture for archives whose payload doc is a transcript doc."""
    root = str(tmp_path / "wh2")
    run_pipeline(spark, sf_dir, root)
    wh = Warehouse(spark, root)
    transcripts = wh.read("transcripts")
    n_docs = 500  # sf0.001/sf0.01 documents count
    seg_fixture = fx.segments(spark, sf_dir)
    joined = (
        transcripts.withColumn("doc_id", F.col("archive_id") % n_docs)
        .join(
            seg_fixture.withColumnRenamed("text", "fix_text"),
            ["doc_id", "page", "seg_idx"],
            "inner",
        )
    )
    mism = joined.filter(F.col("text") != F.col("fix_text")).count()
    assert mism == 0
    assert joined.count() > 0
