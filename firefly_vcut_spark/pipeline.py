"""The reference's daily cron (modal/cron.py:14-21) as four chained
Spark batch stages over a bronze→silver→gold parquet warehouse:

1. discover  — incoming archive rows filtered by per-profile pubdate
               watermarks (W2), landed with first-writer-wins MERGE
               (modal/recording.py:9-57).
2. stream    — work-queue 1 (needs-streaming, newest-first, limited),
               audio object keys attached via the F8 path scheme,
               state advanced with a join-driven update
               (modal/stream.py:24-69 → db/recording.py:241-258).
3. transcribe— work-queue 2 through the U1 transcription kernel
               (mapInPandas, Whisper-shaped output; deterministic stub
               — the audio codec/model is not in this container),
               transcripts landed as silver segment rows, state
               advanced (modal/transcribe.py:59-129).
4. occurrences— work-queue 3 transcripts × songs through the flagship
               W1 fuzzy scan, occurrences upserted last-writer-wins,
               archives marked scanned (modal/occurrence.py:78-131).

Every stage is snapshot-in → snapshot-out and idempotent: re-running
the pipeline discovers nothing new, streams nothing, rescans nothing
(the state machine's NULL-column work queues drain to empty).

Scale notes: state lives in partitioned parquet snapshots (swap in
Delta/Iceberg MERGE for transactional overwrite — same dataflow); the
work queues are filter+top-k over the snapshot (TakeOrderedAndProject,
no global sort); transcripts are written partitioned by page-bearing
archive so stage 4's window pass shuffles once.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from firefly_vcut_spark.functions.scalar import audio_object_key, epoch_to_shanghai_ts
from firefly_vcut_spark.operators.fuzzy import fuzzy_occurrence_scan
from firefly_vcut_spark.operators.merge import insert_ignore, update_join, upsert_last_wins
from firefly_vcut_spark.sources import fixtures as fx
from firefly_vcut_spark.sources.snapshots import SnapshotStore

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.LongType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("seg_idx", T.IntegerType()),
        T.StructField("start", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)

WORDS_PER_SEG = 5
SEGS_PER_PAGE = 10


def transcribe_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """U1: the transcription kernel (modal/transcribe.py:19-48 shape —
    audio bytes in, ordered {start,text} segments out). Model load
    would happen here, once per partition iterator (the @modal.enter
    analog). Deterministic stub: 'decodes' the audio payload bytes to
    text and segments it exactly like a Whisper pass would emit
    timestamped chunks."""
    # per-partition init point (load model on GPU executor in prod)
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in SEGMENT_SCHEMA.fields}
        for archive_id, payload in zip(pdf["archive_id"], pdf["audio_payload"]):
            words = bytes(payload).decode("utf-8").split(" ")
            n_segs = (len(words) - 1) // WORDS_PER_SEG + 1 if words else 0
            for g in range(n_segs):
                seg_words = words[g * WORDS_PER_SEG : (g + 1) * WORDS_PER_SEG]
                out["archive_id"].append(archive_id)
                out["page"].append(g // SEGS_PER_PAGE + 1)
                out["seg_idx"].append(g % SEGS_PER_PAGE)
                out["start"].append(float(g * WORDS_PER_SEG))
                out["text"].append(" ".join(seg_words))
        yield pd.DataFrame(out)


@dataclass
class StageReport:
    discovered: int = 0
    streamed: int = 0
    transcribed: int = 0
    occurrences: int = 0
    details: dict = field(default_factory=dict)


class Warehouse(SnapshotStore):
    """Crash-safe parquet snapshot store (sources/snapshots.py): read
    resolves through the committed ``_LATEST`` pointer, write
    materializes vN+1 fully before an atomic pointer flip — the
    write-new-then-swap analog of the reference's in-place Postgres
    transactions. A lakehouse MERGE (Delta/Iceberg) slots in here
    without touching stage logic."""


def stage_discover(wh: Warehouse, incoming: DataFrame) -> int:
    """Watermark-filtered discovery + first-writer-wins landing."""
    archives = wh.read("archives")
    wm = archives.groupBy("vtuber_profile_id").agg(
        F.max("pubdate").alias("latest"), F.min("pubdate").alias("oldest")
    )
    fresh = (
        incoming.join(F.broadcast(wm), "vtuber_profile_id", "left")
        .filter(
            F.col("latest").isNull()
            | ~((F.col("pubdate") <= F.col("latest")) & (F.col("pubdate") >= F.col("oldest")))
        )
        .select(*archives.columns)
    )
    before = archives.count()
    merged = insert_ignore(archives, fresh, keys=("bvid",))
    wh.write("archives", merged)
    return wh.read("archives").count() - before


def stage_stream(wh: Warehouse, profiles: DataFrame, limit: int = 10) -> int:
    """Queue-1 drain: attach audio object keys for the newest `limit`
    unstreamed archives (the reference's per-run quota)."""
    archives = wh.read("archives")
    queue = (
        archives.filter(
            (F.col("audio_object_keys").isNull() | (F.size("audio_object_keys") == 0))
            & F.col("transcript_object_key").isNull()
        )
        .orderBy(F.desc("pubdate"), F.asc("id"))
        .limit(limit)
    )
    p = profiles.select(F.col("id").alias("pid"), "mid")
    ts = epoch_to_shanghai_ts(F.col("pubdate"))
    staged = (
        queue.join(F.broadcast(p), queue.vtuber_profile_id == F.col("pid"))
        .select(
            "bvid",
            F.array(
                audio_object_key(F.col("mid"), ts, F.col("bvid"), F.lit(1)),
                audio_object_key(F.col("mid"), ts, F.col("bvid"), F.lit(2)),
            ).alias("audio_object_keys"),
        )
    )
    n = staged.count()
    updated = update_join(archives, staged, keys=("bvid",), set_cols=("audio_object_keys",))
    wh.write("archives", updated)
    return n


def stage_transcribe(wh: Warehouse, documents: DataFrame, n_docs: int) -> int:
    """Queue-2 drain through the U1 kernel; transcripts land as silver
    segment rows; audio keys GC'd + transcript key set (the reference
    clears audio after transcription, db/recording.py:260-285)."""
    archives = wh.read("archives")
    queue = archives.filter(
        F.col("audio_object_keys").isNotNull()
        & (F.size("audio_object_keys") > 0)
        & F.col("transcript_object_key").isNull()
    ).select("id", "bvid")
    # 'fetch the audio': payload bytes keyed off the archive (stub pairs
    # each archive with a document's bytes — deterministic stand-in for
    # the object-store GET)
    docs = documents.select(
        F.col("doc_id").alias("_doc_id"), F.encode("text", "utf-8").alias("audio_payload")
    )
    with_audio = queue.join(
        F.broadcast(docs), (F.col("id") % n_docs) == F.col("_doc_id"), "inner"
    ).select(F.col("id").alias("archive_id"), "audio_payload")
    transcripts = with_audio.mapInPandas(transcribe_kernel, SEGMENT_SCHEMA)
    if wh.exists("transcripts"):
        transcripts = upsert_last_wins(
            wh.read("transcripts"), transcripts, keys=("archive_id", "page", "seg_idx")
        )
    wh.write("transcripts", transcripts)

    done = queue.select("bvid").withColumn(
        "transcript_object_key",
        F.concat(F.lit("transcripts/"), F.col("bvid"), F.lit(".json")),
    ).withColumn("audio_object_keys", F.lit(None).cast("array<string>"))
    n = done.count()
    updated = update_join(
        archives, done, keys=("bvid",),
        set_cols=("transcript_object_key", "audio_object_keys"),
    )
    # audio GC wants explicit NULL, not coalesce-keep; overwrite directly
    updated = updated.withColumn(
        "audio_object_keys",
        F.when(F.col("transcript_object_key").isNotNull(), F.lit(None).cast("array<string>"))
        .otherwise(F.col("audio_object_keys")),
    )
    wh.write("archives", updated)
    return n


def stage_occurrences(wh: Warehouse, songs: DataFrame) -> int:
    """Queue-3 drain: flagship W1 scan of unscanned transcripts against
    the songs dim; last-writer-wins occurrence upsert; mark scanned."""
    archives = wh.read("archives")
    queue_ids = archives.filter(
        F.col("transcript_object_key").isNotNull()
        & F.col("last_song_occurrence_scan").isNull()
    ).select(F.col("id").alias("archive_id"), "bvid")
    segments = wh.read("transcripts").join(
        F.broadcast(queue_ids.select("archive_id")), "archive_id", "inner"
    )
    if segments.isEmpty():
        return 0
    found = fuzzy_occurrence_scan(segments, songs, id_col="archive_id").select(
        "song_id", "archive_id", "start", "page"
    )
    if wh.exists("occurrences"):
        merged = upsert_last_wins(
            wh.read("occurrences"), found, keys=("song_id", "archive_id")
        )
    else:
        merged = found
    wh.write("occurrences", merged)

    scanned = queue_ids.select("bvid").withColumn(
        "last_song_occurrence_scan", F.lit("2024-06-02 00:00:00").cast("timestamp")
    )
    wh.write(
        "archives",
        update_join(archives, scanned, keys=("bvid",), set_cols=("last_song_occurrence_scan",)),
    )
    return found.count()


def backfill_occurrences(
    wh: Warehouse,
    songs: DataFrame,
    song_id: int,
    latest_n: int = 20,
) -> int:
    """Backfill: re-scan the latest N transcribed archives for ONE
    song, overwriting any existing occurrence rows (the reference's
    out-of-order/late-data handler — modal/occurrence.py:13-68: a new
    song or fixed lyrics re-scans history; selector-present ⇒ force
    update, cmdline.py:268). Ignores last_song_occurrence_scan marks
    by design."""
    archives = wh.read("archives")
    target_songs = songs.filter(F.col("song_id") == song_id)
    latest = (
        archives.filter(F.col("transcript_object_key").isNotNull())
        .orderBy(F.desc("pubdate"), F.asc("id"))
        .limit(latest_n)
        .select(F.col("id").alias("archive_id"))
    )
    segments = wh.read("transcripts").join(F.broadcast(latest), "archive_id")
    if segments.isEmpty():
        return 0
    found = fuzzy_occurrence_scan(segments, target_songs, id_col="archive_id").select(
        "song_id", "archive_id", "start", "page"
    )
    if wh.exists("occurrences"):
        merged = upsert_last_wins(
            wh.read("occurrences"), found, keys=("song_id", "archive_id")
        )
    else:
        merged = found
    wh.write("occurrences", merged)
    return found.count()


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    incoming: DataFrame | None = None,
    stream_limit: int = 10,
) -> StageReport:
    """One cron tick: the four stages in order over the warehouse.

    Bootstraps the warehouse from the archive fixture on first run.
    ``incoming`` defaults to an empty discovery batch.
    """
    from firefly_vcut_spark.sources.catalog import load_table

    wh = Warehouse(spark, warehouse_dir)
    archives = fx.archives(spark, sf_dir)
    if not wh.exists("archives"):
        wh.write("archives", archives)

    documents = load_table(spark, sf_dir, "documents")
    n_docs = documents.count()
    profiles = fx.profiles(spark, sf_dir)
    songs = fx.songs(spark, sf_dir)

    report = StageReport()
    if incoming is None:
        incoming = archives.limit(0)
    report.discovered = stage_discover(wh, incoming)
    report.streamed = stage_stream(wh, profiles, stream_limit)
    report.transcribed = stage_transcribe(wh, documents, n_docs)
    report.occurrences = stage_occurrences(wh, songs)
    report.details["warehouse"] = {t: wh.path(t) for t in wh.tables()}
    return report
