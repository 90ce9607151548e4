"""Spark 4 custom Python DataSource for the paginated archive feed
(SURVEY.md §2.1 S4/S5 — reference pages through the bilibili series /
video APIs driver-side at series.py:46-117 / video.py:9-106).

rest.py reproduces the reference's *sequential* page walk for
correctness; this DataSource is the at-scale shape: the page range is
split into InputPartitions and each executor fetches its own span
concurrently, so ingest throughput scales with the cluster instead of
the driver's socket. A `pubdate_after` watermark option is pushed into
the partitions: a span whose newest possible row is at or before the
watermark returns without fetching anything (the source-level analog of
partition pruning; the reference's early-stop at video.py:84-100 is the
1-partition special case).

There is no network in the test container, so the page service here is
a deterministic synthetic feed (same rows for the same (mid, page) on
every call — what a paged HTTP GET would return); the partition/read
plumbing is the real thing and is what the tests pin down.

Usage:
    spark.dataSource.register(ArchiveSeriesDataSource)
    df = (spark.read.format("archive_series")
          .option("mid", 42).option("n_pages", 8)
          .option("page_size", 100)
          .option("pages_per_partition", 2)
          .option("pubdate_after", 0)
          .load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

# Feed epoch: rows are emitted newest-first (pubdate strictly
# decreasing over (page, index)), mirroring the reference feed order.
_EPOCH = 1_700_000_000
_STEP = 60  # seconds between consecutive archive pubdates


def synthetic_page(mid: int, page: int, page_size: int, n_pages: int) -> list[dict]:
    """Deterministic stand-in for one paged GET: page `page` (1-based)
    of a feed with n_pages full pages, ordered pubdate DESC."""
    if page < 1 or page > n_pages:
        return []
    rows = []
    for i in range(page_size):
        seq = (page - 1) * page_size + i  # 0 = newest
        rows.append(
            {
                "bvid": f"BV{mid}x{seq:07d}",
                "title": f"mid{mid} archive #{seq}",
                "pubdate": _EPOCH - seq * _STEP,
                "page": page,
            }
        )
    return rows


class _PageSpan(InputPartition):
    def __init__(
        self,
        mid: int,
        first_page: int,
        last_page: int,
        page_size: int,
        n_pages: int,
        pubdate_after: int,
        fetch_log_dir: str | None = None,
    ):
        self.mid = mid
        self.first_page = first_page
        self.last_page = last_page
        self.page_size = page_size
        self.n_pages = n_pages
        self.pubdate_after = pubdate_after
        self.fetch_log_dir = fetch_log_dir


class ArchiveSeriesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.mid = int(options.get("mid", 0))
        self.n_pages = int(options.get("n_pages", 1))
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_partition = max(1, int(options.get("pages_per_partition", 1)))
        self.pubdate_after = int(options.get("pubdate_after", 0))
        # fetch audit: when set, each page GET touches a marker file
        # <dir>/<mid>_<page> from whichever worker process ran it —
        # the observable a connector's request-count metric provides,
        # used by tests to prove pruned spans never fetch
        self.fetch_log_dir = options.get("fetch_log_dir") or None

    def partitions(self) -> Sequence[InputPartition]:
        spans = []
        first = 1
        while first <= self.n_pages:
            last = min(first + self.pages_per_partition - 1, self.n_pages)
            spans.append(
                _PageSpan(
                    self.mid,
                    first,
                    last,
                    self.page_size,
                    self.n_pages,
                    self.pubdate_after,
                    self.fetch_log_dir,
                )
            )
            first = last + 1
        return spans

    def read(self, partition: _PageSpan) -> Iterator[tuple]:
        """Fetch this executor's page span. Watermark pushdown: the
        newest row of page p has seq (p-1)*page_size, so a span whose
        first page already starts at-or-before the watermark yields
        nothing — and no 'HTTP' call is made at all."""
        newest_seq = (partition.first_page - 1) * partition.page_size
        newest_pubdate = _EPOCH - newest_seq * _STEP
        if newest_pubdate <= partition.pubdate_after:
            return
        for page in range(partition.first_page, partition.last_page + 1):
            if partition.fetch_log_dir:
                import os

                open(
                    os.path.join(
                        partition.fetch_log_dir,
                        f"{partition.mid}_{page}",
                    ),
                    "w",
                ).close()
            for row in synthetic_page(
                partition.mid, page, partition.page_size, partition.n_pages
            ):
                if row["pubdate"] <= partition.pubdate_after:
                    return  # feed is pubdate DESC: nothing newer follows
                yield (row["bvid"], row["title"], row["pubdate"], row["page"])


class ArchiveSeriesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "archive_series"

    def schema(self) -> str:
        return "bvid string, title string, pubdate bigint, page int"

    def reader(self, schema: StructType) -> ArchiveSeriesReader:
        return ArchiveSeriesReader(self.options)
