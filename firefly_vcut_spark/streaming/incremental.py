"""Structured Streaming wrappers.

The reference is batch-incremental (daily cron + watermark anchors +
idempotent upserts — SURVEY.md §2.9): its streaming analog is a
``Trigger.AvailableNow`` pass over newly-landed files, which is what
``run_available_now`` provides. On top of that, the event-time
operators a always-on deployment would add: watermarked tumbling
windows and a custom stateful running aggregate via
``applyInPandasWithState``.

Scale notes: file-source streaming scales by listing partitions, not
files (maxFilesPerTrigger bounds a micro-batch); state-store size for
the stateful op is O(groups), and the watermark bounds window state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from firefly_vcut_spark.sources.catalog import (
    _EVENTS_RAW,
    events_ts_is_nanos,
    table_path,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, choosing the same
    footer-conditional ingestion as the batch catalog: native
    TimestampType for timestamp[us] data, raw-nanos conversion for the
    legacy TIMESTAMP(NANOS) vintage."""
    from firefly_vcut_spark.schemas import TABLE_SCHEMAS

    if events_ts_is_nanos(table_path(sf_dir, "events")):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(_EVENTS_RAW)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type: the
    late-data-tolerant aggregation shape. Works identically on batch
    and streaming DataFrames."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    # quantized-BIGINT sum (see session_event_rollup): partition-order
    # independent, so the rounded 4th decimal can't flip the oracle hash
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 10000).cast("long"))
                / F.lit(10000.0),
                4,
            ).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "complete"
) -> list:
    """Drain everything currently available (the Trigger.AvailableNow
    analog of the reference's daily batch), collecting via a memory
    sink; returns the result rows."""
    name = "available_now_sink"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name).collect()


def enriched_user_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch broadcast-joins the static
    dimension at its CURRENT snapshot (re-read per batch — slowly
    changing dims pick up updates without restarts). Stateless: no
    watermark needed on the static side."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
    )
    return events.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "ts", "event_type", "value", "segment", "nationkey"
    )


def click_purchase_pairs(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with a time-bound: each user's
    'purchase' events matched to 'click' events at most ``max_gap``
    earlier. Both sides watermarked so the join state store is bounded
    (clicks retained watermark+gap, purchases watermark) — the shape
    that stays O(window) at 100 TB/day, unlike an unbounded cache."""
    is_stream = events.isStreaming
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if is_stream:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def deduped_events(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming exactly-once-per-key dedup: dropDuplicates on the
    event id with a watermark bounding the dedup state (ids older than
    the watermark are forgotten — the at-least-once-source →
    effectively-once pattern)."""
    src = (
        events.withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    return src.dropDuplicates(["event_id"])


def _sink_tag(checkpoint_dir: str, batch_id: int) -> str:
    """Idempotency tag for a foreachBatch append: per-query id (stable
    hash of the checkpoint path — batch ids are only meaningful within
    one checkpoint lineage) + batch id. Re-delivery of a batch after a
    crash hits the same tag and the store skips the duplicate append —
    the Delta txnAppId/txnVersion exactly-once pattern."""
    import hashlib

    qid = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
    return f"q{qid}_b{batch_id}"


def write_merge_sink(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    compact_on_completion: bool = True,
) -> str:
    """foreachBatch idempotent-merge sink, O(batch) bytes per batch:
    each micro-batch is key-deduped (upsert_last_wins against an empty
    target — same tie-break as the batch pipeline) and APPENDED as a
    tagged SnapshotStore segment; the base is never rewritten in the
    ingest path. Readers resolve last-wins across segments via
    ``read_last_wins`` (merge-on-read); compaction folds the resolved
    view into the next base — automatically every ``compact_segments``
    appends, and once on drain completion here so the returned path is
    a single resolved directory. At scale that final fold is the async
    OPTIMIZE job, not part of ingest.

    Crash-safety: a crash mid-append leaves an orphan segment no
    manifest references; re-delivery of a batch re-appends under the
    same tag and is skipped. So the sink is exactly-once without ever
    reading, rewriting, or even touching the accumulated store in the
    hot path.

    ``target_path`` is the snapshot root (versions live under it);
    returns the committed resolved snapshot directory to read (or,
    with ``compact_on_completion=False``, the snapshot ROOT — read it
    via ``SnapshotStore(spark, root).read_last_wins("data", keys)``)."""
    from firefly_vcut_spark.operators.merge import upsert_last_wins
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    spark = stream_df.sparkSession
    store = SnapshotStore(spark, target_path)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = upsert_last_wins(batch_df.limit(0), batch_df, key_cols)
        if store.exists("data"):
            store.append_segment(
                "data",
                batch,
                tag=_sink_tag(checkpoint_dir, batch_id),
                merge_keys=key_cols,
            )
        else:
            store.write("data", batch)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not compact_on_completion:
        return target_path
    store.compact("data", merge_keys=key_cols)
    return store.path("data")


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + value total, emitting the updated state each
    micro-batch. The custom-stateful plumbing point for operators the
    built-ins can't express (per-key model state, cross-batch
    sessionization variants)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_view_us", T.LongType()),
        T.StructField("last_qc_us", T.LongType()),
        T.StructField("n_views", T.LongType()),
        T.StructField("n_clicks", T.LongType()),
        T.StructField("n_purch", T.LongType()),
    ]
)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_views", T.LongType()),
        T.StructField("n_funnel_clicks", T.LongType()),
        T.StructField("n_funnel_purchases", T.LongType()),
    ]
)

_FUNNEL_WINDOW_US = 30 * 60 * 1_000_000


def funnel_user_state(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch window funnel
    (plans/analytics.win_funnel_conversion): per-user funnel counters
    maintained in applyInPandasWithState state — the always-on shape
    where the batch query's running conditional-MAX frames become two
    timestamps in O(users) state. Rows are evaluated in (ts, event_id)
    order against the last-view / last-funnel-click AS OF the
    preceding row, which is exactly the batch query's
    strictly-preceding ROWS frame — and since a click is never a view
    and a purchase is never a click, the forward-fill AT each row
    equals the strictly-preceding fill, so the whole batch resolves
    with two vectorized ffills (no per-row Python loop; µs
    timestamps < 2^53 are exact in the float64 carrier).
    stream==batch asserted in tests/test_streaming.py."""
    import numpy as np

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        lv, lqc, nv, nc, np_ = (
            state.get if state.exists else (None, None, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
        if len(rows):
            ts_us = rows["ts"].to_numpy("datetime64[ns]").astype(
                "int64"
            ) // 1000
            typ = rows["event_type"].to_numpy()
            is_view = typ == "view"
            # last view as of each row: carried state, then ffill of
            # view timestamps (views are the only writers of lv)
            lv_at = (
                pd.Series(np.where(is_view, ts_us, np.nan))
                .ffill()
                .fillna(np.nan if lv is None else float(lv))
                .to_numpy()
            )
            cutoff = ts_us - _FUNNEL_WINDOW_US
            funnel_click = (
                (typ == "click") & ~np.isnan(lv_at) & (lv_at >= cutoff)
            )
            # last funnel click: depends only on views (not on prior
            # clicks), so one more ffill closes the chain
            lqc_at = (
                pd.Series(np.where(funnel_click, ts_us, np.nan))
                .ffill()
                .fillna(np.nan if lqc is None else float(lqc))
                .to_numpy()
            )
            funnel_purch = (
                (typ == "purchase")
                & ~np.isnan(lqc_at)
                & (lqc_at >= cutoff)
            )
            nv += int(is_view.sum())
            nc += int(funnel_click.sum())
            np_ += int(funnel_purch.sum())
            if is_view.any():
                lv = int(ts_us[is_view][-1])
            if funnel_click.any():
                lqc = int(ts_us[funnel_click][-1])
        state.update((lv, lqc, nv, nc, np_))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [nv],
                "n_funnel_clicks": [nc],
                "n_funnel_purchases": [np_],
            }
        )

    filtered = events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_id", "event_type", "ts")
    return filtered.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_dedup_sink(
    stream_df: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    compact_on_completion: bool = True,
) -> str:
    """Streaming incremental near-dup dedup: continuous-ingest MinHash
    LSH against the accumulated corpus — the always-on analog of
    corpus_incremental_dedup.

    Per micro-batch:
    1. band each incoming doc (minhash_band_table: 8 longs per doc,
       text never shuffles);
    2. drop docs sharing ANY band with a previously ADMITTED doc
       (band join against the store, greedy first-writer-wins);
    3. drop in-batch near-dups: any batch doc sharing a band with a
       LOWER-id batch doc is dropped, so a chain a~b~c admits only a
       (b drops for sharing with a; c drops for sharing with b, even
       if c shares no band with a). Conservative transitive policy —
       never admits a near-dup of an admitted doc, at the cost of
       sometimes dropping a doc whose only neighbor was itself
       dropped (pinned by tests/test_streaming.py chain test);
    4. drop re-delivered ids (anti-join on id vs the store), making
       batch re-delivery a no-op;
    5. APPEND survivors (id, text, bands) as one tagged SnapshotStore
       segment — O(batch) bytes written per batch, the accumulated
       store is never rewritten in the ingest path; the band probe in
       step 2 reads base ∪ segments. A crash mid-append leaves an
       orphan no manifest references; re-delivery re-appends under
       the same tag and is skipped.

    This is exactly the Delta/Iceberg append-per-batch dataflow (bands
    as an indexed column); compaction folds segments into the next
    base — automatically every ``compact_segments`` appends, and once
    on drain completion so the returned path is a single directory (at
    scale: the async OPTIMIZE job, not part of ingest). Returns the
    committed snapshot path (or, with ``compact_on_completion=False``,
    the store ROOT — read via ``SnapshotStore.read("admitted")``);
    corpus = select id, text from it."""
    from firefly_vcut_spark.operators.dedup import (
        minhash_band_table,
        minhash_lsh_candidates,
    )
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    spark = stream_df.sparkSession
    store = SnapshotStore(spark, store_root)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.dropDuplicates([id_col])
        banded = minhash_band_table(
            batch_df, text_col, id_col, num_hashes, bands
        ).withColumnRenamed("id", id_col)
        new = batch_df.join(banded, id_col)

        if store.exists("admitted"):
            admitted = store.read("admitted")
            stored_bands = admitted.select(
                F.explode("bands").alias("band")
            ).select("band.band_id", "band.band_hash").distinct()
            new_exploded = new.select(
                id_col, F.explode("bands").alias("band")
            ).select(id_col, "band.band_id", "band.band_hash")
            dup_ids = (
                new_exploded.join(
                    stored_bands, ["band_id", "band_hash"], "left_semi"
                )
                .select(id_col)
                .distinct()
            )
            new = new.join(dup_ids, id_col, "left_anti").join(
                admitted.select(id_col), id_col, "left_anti"
            )

        # in-batch transitive drop: every id_b of a candidate pair
        # goes (see step 3 in the docstring for the chain semantics)
        losers = (
            minhash_lsh_candidates(
                new.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
                num_hashes=num_hashes,
                bands=bands,
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        survivors = new.join(losers, id_col, "left_anti").select(
            id_col, text_col, "bands"
        )

        if store.exists("admitted"):
            store.append_segment(
                "admitted", survivors, tag=_sink_tag(checkpoint_dir, batch_id)
            )
        else:
            store.write("admitted", survivors)

    q = (
        stream_df.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not compact_on_completion:
        return store_root
    store.compact("admitted")
    return store.path("admitted")


def write_kmv_sketch_sink(
    stream_df: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> str:
    """Streaming distinct-cardinality sketching: fold each micro-batch
    into a per-group KMV bottom-k state table (operators/sketches) —
    the always-on analog of agg_kmv_distinct_users. State is
    O(groups·k) LONGS, so unlike the row stores this sink's full-state
    rewrite IS O(state), not O(history): the whole point of sketching
    a stream.

    The merge (k smallest of the set union) is idempotent and
    commutative, so batch re-delivery after a crash converges to the
    same state and stream == batch regardless of how the input was
    micro-batched (asserted in tests/test_streaming_sketch.py).
    Returns the committed snapshot path; estimate cardinalities with
    sketches.kmv_estimate."""
    from firefly_vcut_spark.operators.sketches import kmv_bottom_k, kmv_merge
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    spark = stream_df.sparkSession
    store = SnapshotStore(spark, store_root)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_sk = kmv_bottom_k(batch_df, group_col, id_col, k).select(
            group_col, "kmv"
        )
        if store.exists("sketch"):
            prev = store.read("sketch").withColumnRenamed("kmv", "prev_kmv")
            merged = (
                batch_sk.join(prev, group_col, "full_outer")
                .select(
                    group_col,
                    kmv_merge(F.col("prev_kmv"), F.col("kmv"), k).alias("kmv"),
                )
            )
        else:
            merged = batch_sk
        store.write("sketch", merged)

    q = (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.path("sketch")


def session_event_rollup(
    events: DataFrame,
    gap: str = "8 hours",
    watermark: str = "2 days",
) -> DataFrame:
    """Per-user session windows via the built-in ``session_window`` —
    the STATE-MERGING window: on a stream, each micro-batch's events
    extend open sessions in the state store or merge two previously
    separate sessions into one (the session key itself changes on
    merge, which is why this needs the dedicated operator and not a
    tumbling window). The event-time watermark bounds state: a session
    whose close (last event + gap) falls behind the watermark is
    finalized and evicted. Works identically on a batch DataFrame
    (Catalyst rewrites it to the gaps-and-islands aggregation).

    Output: (user_id, session_start, n, total_value) — the
    ``w_session_windows`` registry query is this exact rollup on the
    batch path; stream==batch across restarts is asserted in
    tests/test_streaming_sketch.py."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    # sum exact 1e-4 ticks, not doubles: a raw double SUM is
    # order-dependent, so its 4th rounded decimal could flip with the
    # partitioning (and break the oracle hash) — same quantized-BIGINT
    # discipline as win_gapfill_daily, on both the batch and
    # streaming halves (this one function is both)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 10000).cast("long"))
                / F.lit(10000.0),
                4,
            ).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
            "total_value",
        )
    )


ZSCORE_STATE_SCHEMA = T.StructType(
    [T.StructField("hist", T.ArrayType(T.LongType()))]
)

ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def zscore_anomalies_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch rolling z-score scan
    (plans/timeseries_sql.win_zscore_anomalies): per-user
    applyInPandasWithState keeping the last ≤20 quantized values —
    the 21-row window frame becomes O(20) longs of state. Rows are
    processed in (ts, event_id) order within each micro-batch, so
    stream == batch whenever micro-batches respect event-time order
    (time-sliced file arrival — asserted across a 3-slice restart
    sequence in tests/test_streaming_sketch.py).

    The 20-row frames are resolved vectorized (no per-row Python
    loop): prepend the carried ≤20-value history to the sorted batch,
    take exact int64 cumulative sums of qv and qv², and difference
    them 20 apart — each row's Σ/Σ² over its strictly-preceding
    window in O(batch) numpy ops, with the z expression evaluated in
    the same float64 tree as the batch twin's SQL."""
    import numpy as np

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hist = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
        h = len(hist)
        qv = np.concatenate(
            [
                np.asarray(hist, dtype=np.int64),
                np.round(
                    rows["value"].to_numpy(np.float64) * 10000
                ).astype(np.int64),
            ]
        )
        # windowed Σqv / Σqv² over ROWS 20 PRECEDING..1 PRECEDING via
        # cumsum differences — exact int64, same domain as the batch
        # twin's BIGINT window sums
        cs = np.concatenate([[0], np.cumsum(qv)])
        cs2 = np.concatenate([[0], np.cumsum(qv * qv)])
        idx = np.arange(h, len(qv))  # batch rows' global positions
        lo = np.maximum(idx - 20, 0)
        n = (idx - lo).astype(np.float64)
        sq = (cs[idx] - cs[lo]).astype(np.float64)
        sq2 = (cs2[idx] - cs2[lo]).astype(np.float64)
        qf = qv[idx].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            disc = n * sq2 - sq * sq
            z = (qf * n - sq) / (n * np.sqrt(disc / (n * (n - 1))))
            keep = (n >= 10) & (disc > 0) & (np.abs(z) > 2.0)
        out = pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": rows["event_id"].to_numpy(np.int64)[keep],
                "zscore": z[keep],
            }
        )
        state.update((qv[-20:].tolist(),))
        yield out

    filtered = events.select("user_id", "event_id", "ts", "value")
    return filtered.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_inverted_index_sink(
    stream_docs: DataFrame,
    store_root: str,
    checkpoint_dir: str,
) -> str:
    """Continuous search-index maintenance: each micro-batch of
    documents folds to its per-term posting DELTA (operators/text.
    postings_delta) and is APPENDED as a tagged O(batch) segment — the
    accumulated index is never read or rewritten in the ingest path
    (the same segment discipline as write_merge_sink). The full index
    is merge-on-read via ``read_inverted_index``; compaction folds
    segments into the next base (additive union — no merge keys: a
    term's deltas are disjoint-by-batch and consolidate at read).

    Exactly-once: EVERY batch — including the first — goes down the
    tagged append path (the base is a one-time empty schema-bearing
    commit), so re-delivery of any batch after a crash hits its tag
    and is skipped. That tag is load-bearing for cf: doc-id sets
    would collapse in ``merge_postings`` (distinct-unioned) but cf is
    SUMMED, so an untagged first-batch write redelivered as a tagged
    segment would double-count collection frequencies. Returns the
    snapshot root — read with ``read_inverted_index``."""
    from firefly_vcut_spark.operators.text import postings_delta
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    spark = stream_docs.sparkSession
    store = SnapshotStore(spark, store_root)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = postings_delta(batch_df)
        if not store.exists("postings"):
            # zero-row base carries only the schema; idempotent to
            # redo (a crash between this commit and the tagged append
            # just rewrites an empty v2 — no counted rows at stake)
            store.write("postings", delta.limit(0))
        store.append_segment(
            "postings", delta, tag=_sink_tag(checkpoint_dir, batch_id)
        )

    q = (
        stream_docs.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store_root


def read_inverted_index(spark: SparkSession, store_root: str) -> DataFrame:
    """Merge-on-read view of a streamed inverted index: consolidates
    base + segment posting deltas into (term, df, cf, post)."""
    from firefly_vcut_spark.operators.text import merge_postings
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    return merge_postings(SnapshotStore(spark, store_root).read("postings"))


def write_heavy_hitters_sink(
    stream_df: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    k: int = 10,
    pool: int = 64,
    depth: int = 4,
    width: int = 512,
) -> str:
    """Streaming heavy hitters: a Count-Min sketch folded per
    micro-batch (O(depth·width) state — counter ADDITION is the exact
    commutative merge, unlike Misra-Gries whose merge is lossy and
    order-dependent) plus a rolling candidate pool of the ``pool``
    highest-estimate keys seen so far. The always-on analog of
    agg_cms_heavy_hitters.

    Exactly-once: every batch's CMS delta is appended as a SEGMENT
    tagged (query, batch_id) — including batch 0 against an empty
    schema-bearing base — so crash re-delivery of any batch is a
    store no-op (counter addition would otherwise double-count; the
    all-tagged discipline is the same as the inverted-index sink).
    Auto-compaction may concatenate segments (no key resolution);
    readers SUM per (r, bucket), which is invariant under
    concatenation. The candidate pool is re-DERIVED from the sketch
    each batch (not accumulated), so its rewrite is idempotent by
    construction and O(pool).

    Candidate semantics: a key enters the pool in any batch where it
    appears; it survives while its full-history CMS estimate stays in
    the top ``pool``. With COLLISION-STABLE estimates the pool is
    sound for any k ≤ pool (an evicted-and-gone key was outranked by
    ≥pool keys whose estimates only grow, so it can't belong to the
    true top-pool). The boundary is a slow riser whose estimate is
    inflated AFTER eviction by later traffic into its buckets: it can
    enter the batch twin's top-k while no longer being scored. The
    pool margin over k absorbs exactly that — both sides of the
    boundary are pinned by construction in
    tests/test_streaming_sketch.py::test_heavy_hitters_pool_at_k_misses_slow_riser
    (pool == k loses a rigged riser) and
    ::test_heavy_hitters_pool_margin_keeps_slow_riser (one margin
    slot restores stream == batch).

    Returns ``store_root``; query with ``read_heavy_hitters``."""
    from firefly_vcut_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    spark = stream_df.sparkSession
    store = SnapshotStore(spark, store_root)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = cms_table(batch_df, key_col, depth, width)
        if not store.exists("hh_cms"):
            store.write(
                "hh_cms",
                spark.createDataFrame([], "r int, bucket long, n long"),
            )
        store.append_segment(
            "hh_cms",
            delta.select(
                F.col("r").cast("int"),
                F.col("bucket").cast("long"),
                F.col("n").cast("long"),
            ),
            tag=_sink_tag(checkpoint_dir, batch_id),
        )
        cms = read_cms_state(spark, store_root)
        batch_keys = batch_df.select(key_col).distinct()
        if store.exists("hh_pool"):
            batch_keys = batch_keys.unionByName(
                store.read("hh_pool").select(key_col)
            ).distinct()
        scored = cms_point_estimates(batch_keys, cms, key_col, depth, width)
        new_pool = (
            scored.orderBy(F.desc("cms_estimate"), F.asc(key_col))
            .limit(pool)
            .select(
                F.col(key_col).cast("long"),
                F.col("cms_estimate").cast("long"),
            )
        )
        store.write("hh_pool", new_pool)

    q = (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store_root


def read_cms_state(spark: SparkSession, store_root: str) -> DataFrame:
    """Merged CMS counters: SUM per (r, bucket) across the base and
    every segment — correct under any segment concatenation order."""
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(spark, store_root)
    return (
        store.read("hh_cms")
        .groupBy("r", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def read_heavy_hitters(
    spark: SparkSession,
    store_root: str,
    k: int = 10,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Top-k keys by full-history CMS estimate from the committed
    state (pool re-scored against the merged sketch)."""
    from firefly_vcut_spark.operators.sketches import cms_point_estimates
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(spark, store_root)
    cms = read_cms_state(spark, store_root)
    pool = store.read("hh_pool").select(key_col)
    return (
        cms_point_estimates(pool, cms, key_col, depth, width)
        .orderBy(F.desc("cms_estimate"), F.asc(key_col))
        .limit(k)
        .select(
            F.col(key_col).cast("long"),
            F.col("cms_estimate").cast("long"),
        )
    )


def write_token_usage_sink(
    stream_docs: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    pieces: list[tuple[str, int]] | None = None,
    delta_fn=None,
) -> str:
    """Streaming tokenizer-encode accounting (the batch-incremental
    twin of the unigram encode path): each micro-batch of documents is
    exactly Viterbi-decoded under a FROZEN unigram piece table — the
    model a production encode fleet serves while training of the next
    model happens offline — and folds to its per-piece usage delta
    (``operators/unigram.piece_usage_delta``), APPENDED as a tagged
    O(batch) segment. The accumulated usage table is never read or
    rewritten in the ingest path; the running totals (piece-frequency
    drift, fertility monitoring) are merge-on-read via
    ``read_token_usage``.

    Exactly-once: the same all-tagged discipline as
    ``write_inverted_index_sink`` — n_uses is SUMMED at read, so an
    untagged first-batch write redelivered after a crash would
    double-count; every batch goes down the tagged append path over a
    one-time empty schema-bearing base.

    Model-agnostic: default is the unigram Viterbi delta under
    ``pieces``; pass ``delta_fn`` (batch docs → (piece, n_uses)) to
    serve another frozen tokenizer — e.g.
    ``operators/bpe.piece_usage_delta`` for a BPE merge table. Any
    delta_fn must keep the summable-delta contract."""
    from firefly_vcut_spark.operators.unigram import piece_usage_delta
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    if delta_fn is None:
        if pieces is None:
            raise ValueError("pass a unigram piece table or a delta_fn")
        frozen = pieces

        def delta_fn(batch_df: DataFrame) -> DataFrame:
            return piece_usage_delta(batch_df, frozen)

    spark = stream_docs.sparkSession
    store = SnapshotStore(spark, store_root)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = delta_fn(batch_df)
        if not store.exists("piece_usage"):
            store.write("piece_usage", delta.limit(0))
        store.append_segment(
            "piece_usage", delta, tag=_sink_tag(checkpoint_dir, batch_id)
        )

    q = (
        stream_docs.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store_root


def read_token_usage(spark: SparkSession, store_root: str) -> DataFrame:
    """Merge-on-read view of streamed piece-usage deltas: (piece,
    n_uses) consolidated by SUM — segment deltas are disjoint-by-batch
    partial sums of a deterministic decode, so addition is the exact
    merge."""
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    return (
        SnapshotStore(spark, store_root)
        .read("piece_usage")
        .groupBy("piece")
        .agg(F.sum("n_uses").cast("long").alias("n_uses"))
    )


def write_drift_monitor_sink(
    stream_events: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    ref_pred=None,
) -> str:
    """Always-on distribution-drift monitoring: each micro-batch of
    events folds to its per-(feature, bucket) reference/current count
    delta (``plans/drift_sql.bucket_counts`` — the SUMMABLE stage of
    the batch ``agg_distribution_drift`` audit) and is APPENDED as a
    tagged O(alphabet) segment. The running drift report (floored-ppm
    shares + per-feature total-variation) is merge-on-read via
    ``read_drift_report``, which applies the same stage-2 math the
    batch query uses — stream == batch by construction of the shared
    code path, asserted end-to-end in tests/test_streaming_drift.py.

    Exactly-once: counts are SUMMED at read, so the all-tagged segment
    discipline of ``write_inverted_index_sink`` applies verbatim —
    every batch (including batch 0, over a one-time empty
    schema-bearing base) appends under a (query, batch_id) tag, and
    crash re-delivery is a store no-op.

    State is O(feature alphabet) per batch (23 buckets for the default
    feature set), so a day of micro-batches is KBs — the always-on
    shape a 100 TB ingest wants."""
    from firefly_vcut_spark.plans.drift_sql import bucket_counts
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    pred = ref_pred if ref_pred is not None else (F.hour("ts") < 12)
    spark = stream_events.sparkSession
    store = SnapshotStore(spark, store_root)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = bucket_counts(batch_df, pred)
        if not store.exists("drift_counts"):
            store.write("drift_counts", delta.limit(0))
        store.append_segment(
            "drift_counts", delta, tag=_sink_tag(checkpoint_dir, batch_id)
        )

    q = (
        stream_events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store_root


def read_drift_report(spark: SparkSession, store_root: str) -> DataFrame:
    """Merge-on-read drift report over streamed count segments:
    consolidate by SUM per (feature, bucket) — disjoint-by-batch
    partial counts add exactly — then run the batch audit's stage-2
    share/TV math on the bounded alphabet relation.

    An always-on monitor may be read before its stream has committed
    a single micro-batch (the schema-bearing base is only written
    inside fold_batch), so a missing table is a VALID "no data yet"
    state — report it as an empty report, not FileNotFoundError."""
    from firefly_vcut_spark.plans.drift_sql import drift_from_counts
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(spark, store_root)
    if not store.exists("drift_counts"):
        empty = spark.createDataFrame(
            [], "feature string, bucket string, ref_cnt long, cur_cnt long"
        )
        return drift_from_counts(empty)
    counts = (
        store.read("drift_counts")
        .groupBy("feature", "bucket")
        .agg(
            F.sum("ref_cnt").cast("long").alias("ref_cnt"),
            F.sum("cur_cnt").cast("long").alias("cur_cnt"),
        )
    )
    return drift_from_counts(counts)
