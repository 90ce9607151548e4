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


def test_drift_empty_window_reports_zero_shares_not_divide_by_zero(spark, sf_dir):
    """An ingest that so far holds ONLY reference-hours events is a
    real state for an always-on monitor: the current window is empty,
    so its shares must report 0 ppm (TV = sum of live shares / 2),
    not throw DIVIDE_BY_ZERO under ANSI mode (ADVICE r8)."""
    ev = load_table(spark, sf_dir, "events").filter(F.hour("ts") < 12)
    rep = distribution_drift(ev, F.hour("ts") < 12)
    rows = rep.collect()
    assert rows
    assert all(r["cur_cnt"] == 0 and r["cur_ppm"] == 0 for r in rows)
    assert all(r["delta_ppm"] == r["ref_ppm"] for r in rows)
    # per feature: TV = floor(sum(ref_ppm)/2) — "everything drifted"
    by_feat: dict = {}
    for r in rows:
        by_feat.setdefault(r["feature"], []).append(r)
    for rs in by_feat.values():
        assert rs[0]["feature_tv_ppm"] == sum(r["ref_ppm"] for r in rs) // 2


def test_drift_report_before_first_batch_is_empty_not_missing(spark, tmp_path):
    """read_drift_report on a store whose stream has committed zero
    micro-batches returns an EMPTY report with the report schema —
    the 'no data yet' state of an always-on monitor — instead of
    raising FileNotFoundError (ADVICE r8)."""
    rep = read_drift_report(spark, str(tmp_path / "never_written_store"))
    assert rep.count() == 0
    assert rep.columns == [
        "feature",
        "bucket",
        "ref_cnt",
        "cur_cnt",
        "ref_ppm",
        "cur_ppm",
        "delta_ppm",
        "feature_tv_ppm",
    ]
