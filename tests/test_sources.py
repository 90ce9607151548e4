"""Filesystem + REST source shapes: hive-partitioned write/discover
with partition pruning, JSON transcript sink/load roundtrip, and the
paginated-fetch early-stop behaviors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firefly_vcut_spark.schemas import TRANSCRIPT_NESTED
from firefly_vcut_spark.sources import fixtures as fx
from firefly_vcut_spark.sources.rest import (
    archives_dataframe,
    fetch_all_pages,
    fetch_until_watermark,
)


def test_partitioned_write_discover_prune(spark, sf_dir, tmp_path):
    """S3: write archives hive-partitioned by (year, month), read back
    with partition discovery, and confirm a month predicate prunes at
    the PartitionFilters level (no data-file read of other months)."""
    a = fx.archives(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.col("pubdate") + 28800)
    )
    out = str(tmp_path / "archives_partitioned")
    (
        a.select("id", "bvid", "pubdate", F.year("ts").alias("year"), F.month("ts").alias("month"))
        .write.partitionBy("year", "month")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert set(back.columns) == {"id", "bvid", "pubdate", "year", "month"}
    one_month = back.filter((F.col("year") == 2021) & (F.col("month") == 3))
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # counts agree with a derived-column filter over the original
    expected = a.filter((F.year("ts") == 2021) & (F.month("ts") == 3)).count()
    assert one_month.count() == expected


def test_json_transcript_sink_and_load(spark, sf_dir, tmp_path):
    """S2+S8: nested transcripts written as JSON and re-loaded with the
    explicit nested schema roundtrip losslessly."""
    segs = fx.segments(spark, sf_dir)
    nested = (
        segs.groupBy("doc_id", "page")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("seg_idx", "start", "text"))),
                lambda s: F.struct(s.start.alias("start"), s.text.alias("text")),
            ).alias("segs")
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("page", "segs"))), lambda p: p.segs
            ).alias("transcript")
        )
    )
    out = str(tmp_path / "transcripts_json")
    nested.write.json(out)
    back = spark.read.schema(
        "doc_id long, transcript " + TRANSCRIPT_NESTED.simpleString()
    ).json(out)
    reflat = (
        back.select("doc_id", F.posexplode("transcript").alias("p", "ps"))
        .select("doc_id", "p", F.posexplode("ps").alias("i", "seg"))
        .select(
            "doc_id",
            (F.col("p") + 1).cast("int").alias("page"),
            F.col("i").cast("int").alias("seg_idx"),
            F.col("seg.start").alias("start"),
            F.col("seg.text").alias("text"),
        )
    )
    orig = sorted(map(tuple, segs.drop("g_idx").collect()))
    got = sorted(map(tuple, reflat.collect()))
    assert got == orig


def _pages(rows, page, size):
    return rows[(page - 1) * size : (page - 1) * size + size]


def test_fetch_all_pages_stops_on_short_page():
    rows = [{"bvid": f"BV{i}", "title": f"t{i}", "pubdate": 1000 - i} for i in range(23)]
    calls = []

    def fetch(page, size):
        calls.append(page)
        return _pages(rows, page, size)

    got = fetch_all_pages(fetch, page_size=10)
    assert got == rows
    assert calls == [1, 2, 3]  # 10+10+3, short page ends it


def test_fetch_until_watermark_early_stop():
    rows = [{"bvid": f"BV{i}", "title": f"t{i}", "pubdate": 1000 - i} for i in range(50)]
    calls = []

    def fetch(page, size):
        calls.append(page)
        return _pages(rows, page, size)

    got = fetch_until_watermark(fetch, page_size=10, pubdate_after=985)
    assert [r["pubdate"] for r in got] == [1000 - i for i in range(15)]
    assert calls == [1, 2]  # stops mid-page-2, page 3+ never fetched


def test_archives_dataframe_schema(spark):
    rows = [{"bvid": "BV1", "title": "t", "pubdate": 5}]
    df = archives_dataframe(spark, rows)
    assert df.schema.simpleString() == "struct<bvid:string,title:string,pubdate:bigint>"
    assert df.count() == 1


@pytest.mark.parametrize("bad", [[], None])
def test_fetch_all_pages_empty(bad):
    got = fetch_all_pages(lambda p, s: bad or [], page_size=10)
    assert got == []
