"""Scalar column-function library (SURVEY.md §2.8).

Pure-Column functions shared by queries and pipelines. Each mirrors a
reference behavior; oracle-parity notes explain any cross-engine
subtlety.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — `(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场` title → date parts
# (db/recording.py:22-33; non-matching rows are DROPPED, :62).
TITLE_DATE_RE = r"(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场"


def title_date_part(title: Column, group: int) -> Column:
    return F.regexp_extract(title, TITLE_DATE_RE, group).cast("long")


def title_has_date(title: Column) -> Column:
    return F.regexp_extract(title, TITLE_DATE_RE, 0) != ""


# F2 — ordered multi-pattern title extraction: 《》 then 『』 then 「」,
# first match wins (modal/video.py:14-18).
_BRACKET_PATTERNS = ("《(.*)》", "『(.*)』", "「(.*)」")


def extract_bracketed_title(title: Column) -> Column:
    return F.coalesce(
        *[F.nullif(F.regexp_extract(title, p, 1), F.lit("")) for p in _BRACKET_PATTERNS]
    )


# F5 — seconds → zero-padded hh:mm:ss (cmdline.py:549-568).
def seconds_to_hhmmss(seconds: Column) -> Column:
    return F.format_string(
        "%02d:%02d:%02d",
        (seconds / 3600).cast("long"),
        ((seconds % 3600) / 60).cast("long"),
        (seconds % 60).cast("long"),
    )


# F6 — epoch seconds → Asia/Shanghai date parts (cmdline.py:436-441,
# modal/stream.py:336-341). Shanghai is fixed UTC+8 (no DST since
# 1991), so the zone conversion is a plain +28800s shift — keeps the
# expression identical in Spark and DuckDB without ICU/timezone deps.
SHANGHAI_OFFSET_S = 8 * 3600


def epoch_to_shanghai_ts(epoch: Column) -> Column:
    return F.timestamp_seconds(epoch + SHANGHAI_OFFSET_S)


# F8 — partition-path construction `audio/{mid}/{y}/{m:02d}/{d:02d}/{bvid}/{page}.mp4`
# (modal/stream.py:317-344) — the de-facto hive partition spec.
def audio_object_key(
    mid: Column, ts: Column, bvid: Column, page: Column
) -> Column:
    return F.concat_ws(
        "/",
        F.lit("audio"),
        mid.cast("string"),
        F.year(ts).cast("string"),
        F.lpad(F.month(ts).cast("string"), 2, "0"),
        F.lpad(F.dayofmonth(ts).cast("string"), 2, "0"),
        bvid,
        F.concat(page.cast("string"), F.lit(".mp4")),
    )
