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


def test_streaming_zscore_equals_batch_across_restarts(spark, sf_dir, tmp_path):
    """The stateful streaming z-score twin, drained over THREE
    time-sliced file arrivals with restarts between them (same
    checkpoint — state survives), finds exactly the batch query's
    anomalies with matching scores."""
    import os

    from pyspark.sql import functions as F

    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.streaming.incremental import (
        zscore_anomalies_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    row = ev.selectExpr(
        "CAST(percentile(unix_micros(ts), 0.33) AS LONG)",
        "CAST(percentile(unix_micros(ts), 0.66) AS LONG)",
    ).collect()[0]
    t1, t2 = row[0], row[1]
    slices = [
        ev.filter(F.unix_micros("ts") <= t1),
        ev.filter((F.unix_micros("ts") > t1) & (F.unix_micros("ts") <= t2)),
        ev.filter(F.unix_micros("ts") > t2),
    ]
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out_rows = {}
    os.makedirs(src, exist_ok=True)
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(tmp_path / f"slice{i}"))
        import glob
        import shutil

        for f in glob.glob(str(tmp_path / f"slice{i}") + "/*.parquet"):
            shutil.copy(f, os.path.join(src, f"slice{i}.parquet"))
        stream = spark.readStream.schema(ev.schema).parquet(src)
        sink_dir = str(tmp_path / "anom")

        def dump(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink_dir)

        q = (
            zscore_anomalies_stream(stream)
            .writeStream.foreachBatch(dump)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    for r in spark.read.parquet(str(tmp_path / "anom")).collect():
        out_rows[(r["user_id"], r["event_id"])] = r["zscore"]
    batch = {
        (r["user_id"], r["event_id"]): r["zscore"]
        for r in all_queries()["win_zscore_anomalies"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(out_rows) == set(batch)
    for k, z in batch.items():
        # batch emits round(z, 4): raw stream scores agree within the
        # rounding half-width
        assert abs(out_rows[k] - z) <= 5.01e-5, k


def test_streaming_session_windows_equal_batch_across_restarts(
    spark, sf_dir, tmp_path
):
    """Built-in session_window as a stream: three time-sliced file
    arrivals with a query restart between each (same checkpoint), so
    sessions spanning a slice boundary MUST be extended/merged from
    the state store, not recomputed. The final complete-mode emission
    must equal the batch registry query (which shares the exact same
    rollup) — including merged sessions whose session_start was first
    emitted differently in an earlier trigger."""
    import os
    import glob
    import shutil

    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.streaming.incremental import session_event_rollup

    ev = load_table(spark, sf_dir, "events")
    row = ev.selectExpr(
        "CAST(percentile(unix_micros(ts), 0.33) AS LONG)",
        "CAST(percentile(unix_micros(ts), 0.66) AS LONG)",
    ).collect()[0]
    t1, t2 = row[0], row[1]
    slices = [
        ev.filter(F.unix_micros("ts") <= t1),
        ev.filter((F.unix_micros("ts") > t1) & (F.unix_micros("ts") <= t2)),
        ev.filter(F.unix_micros("ts") > t2),
    ]
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    latest: list = []
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(tmp_path / f"slice{i}"))
        for f in glob.glob(str(tmp_path / f"slice{i}") + "/*.parquet"):
            shutil.copy(f, os.path.join(src, f"slice{i}.parquet"))
        stream = spark.readStream.schema(ev.schema).parquet(src)

        def snap(batch_df, _bid):
            latest.clear()
            latest.extend(batch_df.collect())

        q = (
            session_event_rollup(stream)
            .writeStream.foreachBatch(snap)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(map(tuple, latest))
    batch = sorted(
        map(tuple, all_queries()["w_session_windows"].fn(spark, sf_dir).collect())
    )
    assert got == batch
    # sanity: slicing actually split sessions (state merging exercised)
    assert len(slices) == 3 and all(s.count() > 0 for s in slices)


def _skewed_events(spark, tmp_path, n_files=3):
    """Deterministic skewed key stream: users 1-5 are true heavy
    hitters (400-800 events each), users 100-399 light (3 each).
    Written as n_files files → n_files micro-batches."""
    rows = []
    eid = 0
    for u in range(1, 6):
        for _ in range(400 + 100 * u):
            rows.append((eid, u))
            eid += 1
    for u in range(100, 400):
        for _ in range(3):
            rows.append((eid, u))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    src = str(tmp_path / "hh_parts")
    # deterministic interleave: event_id % n_files slices every user
    # across all batches
    df.withColumn("slice", F.col("event_id") % n_files).repartition(
        n_files, "slice"
    ).drop("slice").write.parquet(src)
    return (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streaming_heavy_hitters_equals_batch(spark, tmp_path):
    from firefly_vcut_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )
    from firefly_vcut_spark.streaming.incremental import (
        read_heavy_hitters,
        write_heavy_hitters_sink,
    )

    stream = _skewed_events(spark, tmp_path)
    root = str(tmp_path / "store")
    write_heavy_hitters_sink(
        stream, root, str(tmp_path / "ck"), key_col="user_id", k=5
    )
    got = [
        (r["user_id"], r["cms_estimate"])
        for r in read_heavy_hitters(spark, root, k=5).collect()
    ]
    # batch twin: full-data CMS, same estimates
    batch = spark.read.parquet(str(tmp_path / "hh_parts"))
    cms = cms_table(batch, "user_id")
    est = cms_point_estimates(
        batch.select("user_id").distinct(), cms, "user_id"
    )
    want = [
        (r["user_id"], r["cms_estimate"])
        for r in est.orderBy(
            F.desc("cms_estimate"), F.asc("user_id")
        ).limit(5).collect()
    ]
    assert got == want
    # the true heavies are exactly users 1-5, and CMS is one-sided:
    # estimate >= exact count
    exact = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {u for u, _ in got} == {1, 2, 3, 4, 5}
    for u, e in got:
        assert e >= exact[u]


def test_heavy_hitters_batch0_redelivery_no_double_count(spark, tmp_path):
    """Crash between the store commit and the checkpoint commit of the
    FIRST batch: re-delivery must not double the CMS counters (counter
    addition is the one merge a duplicated delta corrupts)."""
    import os

    from firefly_vcut_spark.streaming.incremental import (
        read_heavy_hitters,
        write_heavy_hitters_sink,
    )

    stream = _skewed_events(spark, tmp_path)
    root = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    write_heavy_hitters_sink(stream, root, ck, key_col="user_id", k=5)
    s1 = [tuple(r) for r in read_heavy_hitters(spark, root, k=5).collect()]
    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    replay = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "hh_parts"))
    )
    write_heavy_hitters_sink(replay, root, ck, key_col="user_id", k=5)
    s2 = [tuple(r) for r in read_heavy_hitters(spark, root, k=5).collect()]
    assert s1 == s2 and len(s1) == 5


def _ordered_batches(spark, tmp_path, batches):
    """Write each batch as ONE parquet file with strictly increasing
    mtimes and lexicographic names, so maxFilesPerTrigger=1 delivers
    them in exactly this order (FileStreamSource sorts by timestamp,
    then path)."""
    import os
    import shutil

    src = str(tmp_path / "ordered_src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(
            rows, "event_id long, user_id long"
        ).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i:02d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    return (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )


def _hh_batch_twin(spark, tmp_path, k, depth, width):
    from firefly_vcut_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )

    batch = spark.read.parquet(str(tmp_path / "ordered_src"))
    cms = cms_table(batch, "user_id", depth, width)
    est = cms_point_estimates(
        batch.select("user_id").distinct(), cms, "user_id", depth, width
    )
    return [
        (r["user_id"], r["cms_estimate"])
        for r in est.orderBy(F.desc("cms_estimate"), F.asc("user_id"))
        .limit(k)
        .collect()
    ]


def _slow_riser_batches():
    """Adversarial slow-riser stream for the pool-margin boundary,
    rigged on the depth=1/width=8 portable-CMS bucket map (keys 2 and
    13 COLLIDE; 9, 7, 3 land in three other distinct buckets):

    - S=2 appears only in batch 0 (count 5) — the slow riser;
    - blockers 9, 7, 3 appear in every batch (count 100 each), so S is
      outranked by exactly 3 keys whenever it is scored;
    - H=13 arrives in batch 2 with count 10000; sharing S's bucket, it
      inflates S's FINAL estimate to ~10005, putting S in the batch
      twin's top-3 even though S was (correctly, at the time) dropped
      from a 3-slot pool after batch 0."""
    eid = [0]

    def ev(u, n):
        out = []
        for _ in range(n):
            out.append((eid[0], u))
            eid[0] += 1
        return out

    return [
        ev(2, 5) + ev(9, 100) + ev(7, 100) + ev(3, 100),
        ev(9, 100) + ev(7, 100) + ev(3, 100),
        ev(13, 10000) + ev(9, 100) + ev(7, 100) + ev(3, 100),
    ]


def test_heavy_hitters_pool_at_k_misses_slow_riser(spark, tmp_path):
    """FAILURE MODE, pinned (r6 verdict task 6): with zero pool margin
    (pool == k) a slow riser evicted on its then-small estimate cannot
    re-enter after later traffic (here a rigged bucket collision)
    raises its full-history estimate above the pool bar — the stream
    answer misses a key the batch twin ranks in its top-k."""
    from firefly_vcut_spark.streaming.incremental import (
        read_heavy_hitters,
        write_heavy_hitters_sink,
    )

    stream = _ordered_batches(spark, tmp_path, _slow_riser_batches())
    root = str(tmp_path / "store")
    write_heavy_hitters_sink(
        stream, root, str(tmp_path / "ck"),
        key_col="user_id", k=3, pool=3, depth=1, width=8,
    )
    got = [
        (r["user_id"], r["cms_estimate"])
        for r in read_heavy_hitters(
            spark, root, k=3, depth=1, width=8
        ).collect()
    ]
    want = _hh_batch_twin(spark, tmp_path, k=3, depth=1, width=8)
    assert 2 in {u for u, _ in want}, "fixture: S must make the batch top-3"
    assert 2 not in {u for u, _ in got}, "S must be lost at pool == k"
    assert got != want


def test_heavy_hitters_pool_margin_keeps_slow_riser(spark, tmp_path):
    """GUARANTEE side: one slot of pool margin (pool = k + #keys that
    ever simultaneously outrank the riser = 3 + 1) keeps S scored every
    batch, so its collision-inflated final estimate is seen at read
    time and stream == batch twin exactly."""
    from firefly_vcut_spark.streaming.incremental import (
        read_heavy_hitters,
        write_heavy_hitters_sink,
    )

    stream = _ordered_batches(spark, tmp_path, _slow_riser_batches())
    root = str(tmp_path / "store")
    write_heavy_hitters_sink(
        stream, root, str(tmp_path / "ck"),
        key_col="user_id", k=3, pool=4, depth=1, width=8,
    )
    got = [
        (r["user_id"], r["cms_estimate"])
        for r in read_heavy_hitters(
            spark, root, k=3, depth=1, width=8
        ).collect()
    ]
    want = _hh_batch_twin(spark, tmp_path, k=3, depth=1, width=8)
    assert 2 in {u for u, _ in got}
    assert got == want
