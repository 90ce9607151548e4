"""Paginated REST-source ingestion (SURVEY.md §2.1 S4/S5).

The reference pages through bilibili series/video APIs on the driver
(series.py:46-117, video.py:9-106) with two behaviors our ingestion
layer reproduces against any page-callable:

- fixed-size pagination until a short page (S4), and
- early termination once a descending-ordered page crosses the
  pubdate watermark (S5) — no further pages are fetched.

Rows land as a DataFrame via ``spark.createDataFrame`` with an
explicit schema (at cluster scale this becomes a Spark 4 custom
Python DataSource; the page-walking logic is identical)."""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ARCHIVE_ROW = T.StructType(
    [
        T.StructField("bvid", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("pubdate", T.LongType()),
    ]
)

PageFetcher = Callable[[int, int], Sequence[dict]]
"""(page_number_1based, page_size) -> rows, ordered pubdate DESC."""


def fetch_all_pages(fetch: PageFetcher, page_size: int) -> list[dict]:
    """S4: page until a short (or empty) page."""
    rows: list[dict] = []
    page = 1
    while True:
        batch = list(fetch(page, page_size))
        rows.extend(batch)
        if len(batch) < page_size:
            return rows
        page += 1


def fetch_until_watermark(
    fetch: PageFetcher, page_size: int, pubdate_after: int
) -> list[dict]:
    """S5: assuming pages are ordered pubdate DESC, stop fetching as
    soon as a row at-or-before the watermark appears; rows past it in
    the same page are dropped (video.py:84-100's early stop)."""
    rows: list[dict] = []
    page = 1
    while True:
        batch = list(fetch(page, page_size))
        for row in batch:
            if row["pubdate"] <= pubdate_after:
                return rows
            rows.append(row)
        if len(batch) < page_size:
            return rows
        page += 1


def archives_dataframe(spark: SparkSession, rows: Sequence[dict]) -> DataFrame:
    """Land fetched rows with the explicit archive-row schema."""
    return spark.createDataFrame(list(rows), ARCHIVE_ROW)
