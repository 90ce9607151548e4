"""Corpus-preparation operators for LLM training-data pipelines:
deterministic splits, stratified sampling, quality filter chains, PII
redaction, duplicate-cluster resolution (connected components), and
sequence packing.

Everything except the sequential packing fold is pure-Column JVM code.
The split/sample hashes are plain integer arithmetic (multiplicative
hashing) so the DuckDB oracle replays them exactly — same portable-hash
discipline as operators/dedup.perm_coeffs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Knuth multiplicative constant (2^32 / phi); same family as dedup.py.
_SPLIT_A = 2654435761
_SPLIT_MOD = 4294967296  # 2^32
_SAMPLE_A = 40503
_SAMPLE_B = 7
_SAMPLE_P = 1_000_000_007


def split_bucket(key: Column, n_buckets: int = 1000) -> Column:
    """Deterministic [0, n_buckets) bucket from an integer key.

    Multiplicative hashing keeps the assignment stable across runs,
    engines, and cluster sizes — the property a train/val/test split
    must have so re-ingesting a document never migrates it between
    splits (no leakage). key*A stays < 2^63 for any realistic id."""
    return F.pmod(key.cast("long") * F.lit(_SPLIT_A), F.lit(_SPLIT_MOD)) % n_buckets


def split_label(key: Column, train_pct: int = 90, val_pct: int = 5) -> Column:
    """train/val/test label at train_pct/val_pct/(rest) percent."""
    b = split_bucket(key, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sample_hash(key: Column) -> Column:
    """Affine hash used as the deterministic 'random' sort key for
    stratified sampling — uniform enough over ids, exactly replayable
    in any engine with 64-bit integer arithmetic."""
    return (key.cast("long") * _SAMPLE_A + _SAMPLE_B) % _SAMPLE_P


def stratified_sample(
    df: DataFrame, stratum: Column, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank by
    (sample_hash, id) inside each stratum, keep rank <= k. One shuffle
    on the stratum key; at 100 TB the per-stratum top-k never
    materializes a global sort (rank window over the stratum
    partition only)."""
    from pyspark.sql import Window

    w = Window.partitionBy("stratum").orderBy("h", id_col)
    return (
        df.withColumn("stratum", stratum)
        .withColumn("h", sample_hash(F.col(id_col)))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("h")
    )


# --- connected components (duplicate-cluster resolution) -------------------


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Min-label propagation over an undirected edge list → (id,
    component) where component = min id reachable. This is the
    dedup-cluster resolution step: near-dup *pairs* (from LSH/Jaccard)
    become *clusters*, from which one canonical doc per cluster
    survives.

    Each iteration is one shuffle (label join + min-aggregate), and the
    label front advances at least one hop, so iterations ~ graph
    diameter — near-dup graphs are dense blobs with tiny diameters.
    This is the simple variant of the map-reduce CC family
    (Hash-to-Min / two-phase large-star–small-star); those reduce the
    round count to O(log d) at trillion-edge scale with the same
    per-round join shape. Convergence is checked with a 1-row
    aggregate per round; each round's result is localCheckpoint()ed to
    keep the lineage from growing into the loop."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.join(
                labels.withColumnRenamed("component", "old"), "id"
            )
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


# --- sequence packing (next-fit) -------------------------------------------

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_id", T.LongType()),
    ]
)


def pack_next_fit(
    docs: DataFrame,
    capacity: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Next-fit sequence packing: within each group, walk docs in id
    order and append to the current bin while it fits, else open a new
    bin (an oversize doc gets a bin of its own and closes it).

    The fold is inherently sequential *within* a group, so it runs as
    one applyInPandas pass per group — groups pack in parallel across
    executors, which is the scale axis that matters (sources/shards
    are many, docs per shard bounded). Token counts are computed
    JVM-side before the fold; Python only carries the (bin, fill)
    state."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins: list[int] = []
        fills = 0
        bin_id = -1
        for t in pdf[tokens_col]:
            if bin_id < 0 or fills + t > capacity:
                bin_id += 1
                fills = int(t)
            else:
                fills += int(t)
            bins.append(bin_id)
        return pd.DataFrame(
            {
                "source": pdf[group_col],
                "doc_id": pdf[id_col],
                "n_tokens": pdf[tokens_col],
                "bin_id": bins,
            }
        )

    sel = docs.select(
        F.col(group_col),
        F.col(id_col).cast("long"),
        F.col(tokens_col).cast("long"),
    )
    return sel.groupBy(group_col).applyInPandas(fold, PACKED_SCHEMA)
