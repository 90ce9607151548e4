"""Streaming: AvailableNow drain must equal the batch twin; the
custom stateful operator must equal a batch groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.sources.catalog import load_table
from firefly_vcut_spark.streaming.incremental import (
    read_events_stream,
    run_available_now,
    running_user_totals,
    windowed_event_counts,
)


def test_available_now_equals_batch(spark, sf_dir, tmp_path):
    stream = windowed_event_counts(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, str(tmp_path / "ckpt"))
    batch = windowed_event_counts(load_table(spark, sf_dir, "events")).collect()
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len({key(r) for r in got}) == len(got)


def test_available_now_checkpoint_resume_is_idempotent(spark, sf_dir, tmp_path):
    """Exactly-once file-source semantics: a second AvailableNow run
    over the SAME checkpoint sees no new files and emits nothing new
    (the re-runnable daily-cron property, now with stream state)."""
    ckpt = str(tmp_path / "ckpt_resume")
    out = str(tmp_path / "out_parquet")
    stream = windowed_event_counts(read_events_stream(spark, sf_dir))

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # append mode only emits finalized windows; with a static file and
    # watermark the emitted set must not grow on re-run
    drain()
    n1 = spark.read.parquet(out).count()
    drain()
    n2 = spark.read.parquet(out).count()
    assert n2 == n1


def test_stateful_running_totals_equals_batch(spark, sf_dir, tmp_path):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, str(tmp_path / "ckpt2"), output_mode="update")
    # update mode may emit a row per micro-batch per user; the LAST
    # emission per user is the final running total.
    final = {}
    for r in got:
        final[r.user_id] = (r.n_events, r.total_value)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("tv"),
        )
        .collect()
    )
    assert len(batch) == len(final)
    for r in batch:
        n, tv = final[r.user_id]
        assert n == r.n
        assert abs(tv - r.tv) < 1e-6


def test_continuous_aggregate_equals_full_rollup(spark, sf_dir):
    """Rollup-plus-tail must equal aggregating everything raw, and
    must honor a pre-stored rollup snapshot (history never rescanned)."""
    from firefly_vcut_spark.operators.rollup import continuous_aggregate, daily_rollup

    ev = load_table(spark, sf_dir, "events")
    full = {(r.day, r.event_type): (r.n, r.total_value) for r in daily_rollup(ev).collect()}
    merged = {
        (r.day, r.event_type): (r.n, r.total_value)
        for r in continuous_aggregate(ev, "2024-01-20").collect()
    }
    assert merged == full
    # with a stored snapshot: same result without touching history raw
    snapshot = daily_rollup(ev.filter("CAST(ts AS DATE) < DATE '2024-01-20'"))
    merged2 = {
        (r.day, r.event_type): (r.n, r.total_value)
        for r in continuous_aggregate(ev, "2024-01-20", rollup=snapshot).collect()
    }
    assert merged2 == full


def test_stream_static_enrichment_equals_batch(spark, sf_dir, tmp_path):
    from firefly_vcut_spark.streaming.incremental import enriched_user_events

    cust = load_table(spark, sf_dir, "customer")
    stream = enriched_user_events(read_events_stream(spark, sf_dir), cust)
    got = run_available_now(stream, str(tmp_path / "ck_enrich"), output_mode="append")
    batch = enriched_user_events(load_table(spark, sf_dir, "events"), cust).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    from firefly_vcut_spark.streaming.incremental import click_purchase_pairs

    stream = click_purchase_pairs(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, str(tmp_path / "ck_ss"), output_mode="append")
    batch = click_purchase_pairs(load_table(spark, sf_dir, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 0  # the fixture must actually exercise the join


def test_streaming_dedup_collapses_planted_duplicates(spark, sf_dir, tmp_path):
    """Two stream sources over the same file = every event delivered
    twice; watermarked dropDuplicates must collapse them to one."""
    from firefly_vcut_spark.streaming.incremental import deduped_events

    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    stream = deduped_events(doubled).select("event_id")
    got = run_available_now(stream, str(tmp_path / "ck_dd"), output_mode="append")
    n_batch = load_table(spark, sf_dir, "events").count()
    assert len(got) == n_batch
    assert len({r.event_id for r in got}) == n_batch


def test_foreach_batch_merge_sink_is_idempotent(spark, sf_dir, tmp_path):
    from firefly_vcut_spark.streaming.incremental import write_merge_sink

    target = str(tmp_path / "merged")

    def run(ck):
        stream = read_events_stream(spark, sf_dir).select(
            "event_id", "event_type", "value"
        )
        return write_merge_sink(stream, target, str(tmp_path / ck), ["event_id"])

    p1 = run("ck_m1")
    n1 = spark.read.parquet(p1).count()
    p2 = run("ck_m2")  # fresh checkpoint: same batch re-delivered end-to-end
    n2 = spark.read.parquet(p2).count()
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n1 == n_batch and n2 == n_batch


def test_streaming_incremental_dedup_sink(spark, tmp_path):
    """Continuous-ingest near-dup dedup: batch 2's exact copy and
    near-copy of admitted docs are dropped, fresh docs are admitted,
    re-delivered ids are no-ops, and re-running the same batch leaves
    the store unchanged."""
    from firefly_vcut_spark.streaming.incremental import write_dedup_sink

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen"
    )
    third = (
        "red orange yellow green blue indigo violet cyan magenta "
        "white black gray silver gold"
    )
    fresh = (
        "spark duck query table shuffle broadcast partition join "
        "window agg scan sort merge stream"
    )
    # change only the final token: 11/12 shingles shared (a mid-string
    # edit perturbs 3 shingles and can legitimately miss at 32x8 LSH)
    near_copy = base.replace(" xi", " CHANGED")

    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [(1, base), (2, other), (3, third)], "doc_id long, text string"
    ).write.parquet(b1)
    spark.createDataFrame(
        [(10, near_copy), (11, fresh), (1, base), (12, other)],
        "doc_id long, text string",
    ).write.parquet(b2)

    store = str(tmp_path / "store")

    def run(src, ck):
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        return write_dedup_sink(stream, store, str(tmp_path / ck))

    p1 = run(b1, "ck1")
    assert {r.doc_id for r in spark.read.parquet(p1).collect()} == {1, 2, 3}

    p2 = run(b2, "ck2")
    admitted = {r.doc_id for r in spark.read.parquet(p2).collect()}
    # 10 = near-copy of 1 (LSH hit), 12 = exact copy of 2, 1 = re-delivery
    assert admitted == {1, 2, 3, 11}

    p3 = run(b2, "ck3")  # full re-delivery of batch 2
    assert {r.doc_id for r in spark.read.parquet(p3).collect()} == {1, 2, 3, 11}

    # store survives a reader-side check: bands column intact
    df = spark.read.parquet(p3)
    assert "bands" in df.columns and df.filter("size(bands) = 8").count() == 4


# --- O(batch) segment appends + chain semantics (r4) ---


def _write_parquet_file(path, mtime, names, cols):
    """One single-file parquet per micro-batch, mtime-ordered so the
    file source's batch order is deterministic."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    pq.write_table(pa.table(dict(zip(names, cols))), path)
    os.utime(path, (mtime, mtime))


def test_merge_sink_appends_segments_not_rewrites(spark, tmp_path):
    """Three micro-batches: the first writes base v1; each later batch
    appends ONE segment sized O(batch) — the base version never bumps
    in the ingest path, and merge-on-read resolves last-wins."""
    from firefly_vcut_spark.sources.snapshots import SnapshotStore
    from firefly_vcut_spark.streaming.incremental import write_merge_sink

    src = tmp_path / "src"
    src.mkdir()
    _write_parquet_file(str(src / "f1.parquet"), 1_000_000, ["k", "v"], [[1, 2], [10, 20]])
    _write_parquet_file(str(src / "f2.parquet"), 1_000_010, ["k", "v"], [[2, 3], [21, 30]])
    _write_parquet_file(str(src / "f3.parquet"), 1_000_020, ["k", "v"], [[1], [12]])

    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    root = write_merge_sink(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "ck"),
        ["k"],
        compact_on_completion=False,
    )
    store = SnapshotStore(spark, root)
    assert store.current_version("data") == 1  # base written once, never rebuilt
    segs = store.segments("data")
    assert len(segs) == 2
    # O(batch): each segment holds exactly its batch's rows
    import os as _os

    tdir = _os.path.join(root, "data")
    sizes = [
        spark.read.parquet(_os.path.join(tdir, s)).count() for s in segs
    ]
    assert sizes == [2, 1]
    got = {r.k: r.v for r in store.read_last_wins("data", ["k"]).collect()}
    assert got == {1: 12, 2: 21, 3: 30}
    # compaction folds the resolved view; the sink's default path
    assert store.compact("data", merge_keys=["k"]) == 2
    assert {r.k: r.v for r in store.read("data").collect()} == got


def test_dedup_sink_appends_segments_not_rewrites(spark, tmp_path):
    """The dedup sink's ingest path writes O(batch) bytes: admitting a
    second batch appends one survivor-sized segment, never rewriting
    the admitted store."""
    from firefly_vcut_spark.sources.snapshots import SnapshotStore
    from firefly_vcut_spark.streaming.incremental import write_dedup_sink

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen"
    )
    fresh = (
        "spark duck query table shuffle broadcast partition join "
        "window agg scan sort merge stream"
    )
    src = tmp_path / "dsrc"
    src.mkdir()
    _write_parquet_file(
        str(src / "b1.parquet"), 1_000_000, ["doc_id", "text"], [[1, 2], [base, other]]
    )
    # batch 2: one fresh doc, one exact re-delivery, one exact dup
    _write_parquet_file(
        str(src / "b2.parquet"), 1_000_010, ["doc_id", "text"],
        [[11, 1, 12], [fresh, base, other]],
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    root = write_dedup_sink(
        stream,
        str(tmp_path / "dstore"),
        str(tmp_path / "dck"),
        compact_on_completion=False,
    )
    store = SnapshotStore(spark, root)
    assert store.current_version("admitted") == 1
    segs = store.segments("admitted")
    assert len(segs) == 1
    import os as _os

    seg_df = spark.read.parquet(_os.path.join(root, "admitted", segs[0]))
    assert [r.doc_id for r in seg_df.collect()] == [11]  # survivors only
    assert {r.doc_id for r in store.read("admitted").collect()} == {1, 2, 11}


def test_dedup_sink_in_batch_chain_drops_transitively(spark, tmp_path):
    """Pins the documented in-batch policy: for a chain a~b~c where c
    shares a band with b but NOT with a, c is still dropped (every
    id_b of a candidate pair goes), so only a survives."""
    from firefly_vcut_spark.operators.dedup import minhash_lsh_candidates
    from firefly_vcut_spark.streaming.incremental import write_dedup_sink

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    toks = a.split()
    bt = list(toks)
    bt[0] = "CHANGEDB"
    b = " ".join(bt)
    ct = list(bt)
    ct[12] = "CHANGEDC"
    c = " ".join(ct)
    fresh = (
        "spark duck query table shuffle broadcast partition join "
        "window agg scan sort merge stream"
    )
    # precondition (deterministic under the fixed hash family):
    # candidates are exactly the chain links, no (a, c) edge
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            spark.createDataFrame(
                [(1, a), (2, b), (3, c)], "doc_id long, text string"
            )
        ).collect()
    }
    assert pairs == {(1, 2), (2, 3)}

    src = tmp_path / "csrc"
    src.mkdir()
    _write_parquet_file(
        str(src / "b1.parquet"), 1_000_000, ["doc_id", "text"],
        [[1, 2, 3, 4], [a, b, c, fresh]],
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    p = write_dedup_sink(stream, str(tmp_path / "cstore"), str(tmp_path / "cck"))
    assert {r.doc_id for r in spark.read.parquet(p).collect()} == {1, 4}


def test_stateful_funnel_equals_batch_window_funnel(spark, sf_dir, tmp_path):
    """The O(users)-state streaming funnel must reproduce the batch
    window-funnel exactly (same strictly-preceding semantics)."""
    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.streaming.incremental import funnel_user_state

    stream = funnel_user_state(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, str(tmp_path / "ckpt_funnel"), output_mode="update")
    final = {}
    for r in got:  # update mode: last emission per user wins
        final[r.user_id] = (r.n_views, r.n_funnel_clicks, r.n_funnel_purchases)
    batch = all_queries()["win_funnel_conversion"].fn(spark, sf_dir).collect()
    assert len(batch) == len(final)
    for r in batch:
        assert final[r.user_id] == (
            r.n_views,
            r.n_funnel_clicks,
            r.n_funnel_purchases,
        ), r


def test_stateful_funnel_redrain_is_idempotent(spark, sf_dir, tmp_path):
    """A second AvailableNow drain with the SAME checkpoint must not
    re-process files — the state counters stay exactly where the first
    drain left them (the checkpoint is what makes stateful counters
    exactly-once over re-runs)."""
    from firefly_vcut_spark.streaming.incremental import funnel_user_state

    ckpt = str(tmp_path / "ckpt_funnel_idem")

    def drain():
        rows = []
        q = (
            funnel_user_state(read_events_stream(spark, sf_dir))
            .writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return rows

    first = drain()
    assert first  # the first drain processed the file
    second = drain()
    assert second == []  # checkpoint: nothing new → no re-processing
