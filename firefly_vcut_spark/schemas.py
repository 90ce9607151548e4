"""Explicit StructType schemas for every input table.

The reference names every column in every statement and never infers
schema (SURVEY.md §1.4); we follow suit: all reads pass an explicit
schema so column pruning and predicate pushdown operate on known types
and a schema drift fails loudly at read time, not deep in a job.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver-synthetic star schema (/root/testdata/sf*/ — TESTDATA.md) ---

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- domain schemas (reference data model, SURVEY.md §1.2 / FIXTURES.md A) ---

# Transcript in its native nested shape: array (pages) of array (ordered
# segments) of {start, text}. Reference: transcribe.py:54-63.
TRANSCRIPT_SEGMENT = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)
TRANSCRIPT_NESTED = T.ArrayType(T.ArrayType(TRANSCRIPT_SEGMENT))

# Silver (normalized) transcript: one row per segment.
TRANSCRIPT_SILVER = T.StructType(
    [
        T.StructField("bvid", T.StringType()),
        T.StructField("page", T.IntegerType()),  # 1-based in outputs
        T.StructField("seg_idx", T.IntegerType()),  # 0-based within page
        T.StructField("start", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)

SONG = T.StructType(
    [
        T.StructField("song_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("lyrics_fragment", T.StringType()),
    ]
)

ARCHIVE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("bvid", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("vtuber_profile_id", T.LongType()),
        T.StructField("pubdate", T.LongType()),
        T.StructField("date", T.TimestampType()),
        T.StructField("duration", T.LongType()),
        T.StructField("cover", T.StringType()),
        T.StructField("audio_object_keys", T.ArrayType(T.StringType())),
        T.StructField("transcript_object_key", T.StringType()),
        T.StructField("last_song_occurrence_scan", T.TimestampType()),
    ]
)

SONG_OCCURRENCE = T.StructType(
    [
        T.StructField("song_id", T.LongType()),
        T.StructField("vtuber_song_id", T.LongType()),
        T.StructField("archive_id", T.LongType()),
        T.StructField("start", T.LongType()),
        T.StructField("page", T.IntegerType()),
    ]
)
