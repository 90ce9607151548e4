"""Streaming drift-monitor sink: the merged segment counts reproduce
the batch agg_distribution_drift report no matter how the events were
micro-batched; ingest writes O(alphabet) segments; crash re-delivery
is idempotent (same all-tagged discipline as the index/CMS/token
sinks)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from firefly_vcut_spark.plans.drift_sql import distribution_drift
from firefly_vcut_spark.sources.catalog import load_table
from firefly_vcut_spark.streaming.incremental import (
    read_drift_report,
    write_drift_monitor_sink,
)


def _stream_events(spark, sf_dir, tmp_path, n_files=4, name="ev_parts"):
    src = str(tmp_path / name)
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(n_files).write.parquet(src)
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _report_map(df):
    return {
        (r["feature"], r["bucket"]): (
            r["ref_cnt"],
            r["cur_cnt"],
            r["ref_ppm"],
            r["cur_ppm"],
            r["feature_tv_ppm"],
        )
        for r in df.collect()
    }


def test_streamed_drift_equals_batch(spark, sf_dir, tmp_path):
    stream = _stream_events(spark, sf_dir, tmp_path)
    root = write_drift_monitor_sink(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    streamed = _report_map(read_drift_report(spark, root))
    batch = _report_map(
        distribution_drift(load_table(spark, sf_dir, "events"), F.hour("ts") < 12)
    )
    assert streamed == batch and len(batch) > 0


def test_drift_ingest_writes_o_alphabet_segments(spark, sf_dir, tmp_path):
    stream = _stream_events(spark, sf_dir, tmp_path, n_files=4)
    root = write_drift_monitor_sink(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    tdir = os.path.join(root, "drift_counts")
    bases = [n for n in os.listdir(tdir) if n.startswith("v")]
    segs = [n for n in os.listdir(tdir) if n.startswith("s")]
    assert bases == ["v1"]
    assert len(segs) == 4


def test_drift_crash_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """Drop the checkpoint's last batch commit after a full drain and
    restart: re-delivery hits the same tag and counts don't double."""
    ck = str(tmp_path / "ck1")
    stream = _stream_events(spark, sf_dir, tmp_path)
    root = str(tmp_path / "store")
    write_drift_monitor_sink(stream, root, ck)
    s1 = _report_map(read_drift_report(spark, root))
    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    src = str(tmp_path / "ev_parts")
    ev_schema = load_table(spark, sf_dir, "events").schema
    replay = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    write_drift_monitor_sink(replay, root, ck)
    assert _report_map(read_drift_report(spark, root)) == s1
