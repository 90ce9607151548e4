"""Upsert / merge recipes (A6, J10) as pure DataFrame transforms.

The reference mutates Postgres rows in place (ON CONFLICT DO NOTHING /
DO UPDATE, UPDATE ... FROM VALUES — db/recording.py:44-66,
db/occurrence.py:22-51, dblocal.py:225-250). Without a transactional
table format in this environment, the same semantics are expressed as
deterministic snapshot→snapshot transforms: ``new = merge(old,
updates)`` followed by an atomic overwrite of the target (at scale:
write-new-then-swap, or a Delta/Iceberg MERGE — the transform below is
exactly the MERGE's join semantics, so swapping the sink in changes no
query logic).

All three recipes shuffle once on the key columns and are idempotent:
applying the same updates twice ≡ once (property-tested).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_columns(target: DataFrame, updates: DataFrame) -> None:
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target={sorted(target.columns)} "
            f"updates={sorted(updates.columns)}"
        )


def insert_ignore(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """First-writer-wins insert: keep every target row; add update rows
    whose key is absent from the target (ON CONFLICT DO NOTHING —
    db/recording.py:49). Duplicate keys *within* updates keep one
    deterministic winner (min over the non-key columns' struct)."""
    _check_columns(target, updates)
    cols = target.columns
    fresh = (
        updates.join(target.select(*keys).distinct(), list(keys), "left_anti")
        .groupBy(*keys)
        .agg(F.min(F.struct(*[c for c in cols if c not in keys])).alias("_v"))
        .select(*keys, *[F.col(f"_v.{c}").alias(c) for c in cols if c not in keys])
        .select(*cols)
    )
    return target.unionByName(fresh)


def upsert_last_wins(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Last-writer-wins upsert: update rows replace matching target
    rows, new keys append (ON CONFLICT DO UPDATE —
    db/occurrence.py:35-37). Ties within updates resolved by max of
    (order_col | value struct) for determinism."""
    _check_columns(target, updates)
    cols = target.columns
    val_cols = [c for c in cols if c not in keys]
    tagged = target.withColumn("_pri", F.lit(0)).unionByName(
        updates.withColumn("_pri", F.lit(1))
    )
    ordering = (
        F.struct("_pri", order_col, *val_cols)
        if order_col
        else F.struct("_pri", *val_cols)
    )
    return (
        tagged.groupBy(*keys)
        .agg(F.max_by(F.struct(*val_cols), ordering).alias("_v"))
        .select(*keys, *[F.col(f"_v.{c}").alias(c) for c in val_cols])
        .select(*cols)
    )


def update_join(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    set_cols: Sequence[str],
) -> DataFrame:
    """Join-driven UPDATE: overwrite ``set_cols`` for rows whose key
    appears in updates; leave everything else untouched; updates with
    no matching target row are ignored (UPDATE ... FROM (VALUES) —
    dblocal.py:225-250)."""
    upd = updates.select(
        *keys, *[F.col(c).alias(f"_new_{c}") for c in set_cols]
    )
    out = target.join(F.broadcast(upd), list(keys), "left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_new_{c}"), F.col(c)))
    return out.select(*target.columns)
