"""Merge-recipe property tests (SURVEY.md §5.3): idempotency —
applying the same updates twice ≡ once — plus the first/last-writer
semantics on a conflicting key."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.merge import (
    insert_ignore,
    update_join,
    upsert_last_wins,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fixture(spark):
    target = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (3, 30, 300)], "k long, a long, b long"
    )
    updates = spark.createDataFrame(
        [(2, 21, 201), (4, 40, 400)], "k long, a long, b long"
    )
    return target, updates


def test_upsert_last_wins_semantics_and_idempotency(spark):
    target, updates = _fixture(spark)
    once = upsert_last_wins(target, updates, keys=("k",))
    assert _rows(once) == [(1, 10, 100), (2, 21, 201), (3, 30, 300), (4, 40, 400)]
    twice = upsert_last_wins(once, updates, keys=("k",))
    assert _rows(twice) == _rows(once)


def test_insert_ignore_semantics_and_idempotency(spark):
    target, updates = _fixture(spark)
    once = insert_ignore(target, updates, keys=("k",))
    # first writer wins: k=2 keeps the target's values
    assert _rows(once) == [(1, 10, 100), (2, 20, 200), (3, 30, 300), (4, 40, 400)]
    twice = insert_ignore(once, updates, keys=("k",))
    assert _rows(twice) == _rows(once)


def test_update_join_only_touches_matches(spark):
    target, updates = _fixture(spark)
    out = update_join(target, updates.select("k", "a"), keys=("k",), set_cols=("a",))
    # k=2 updated, k=4 ignored (no insert), b untouched
    assert _rows(out) == [(1, 10, 100), (2, 21, 200), (3, 30, 300)]
    again = update_join(out, updates.select("k", "a"), keys=("k",), set_cols=("a",))
    assert _rows(again) == _rows(out)


def test_upsert_duplicate_keys_in_updates_deterministic(spark):
    target = spark.createDataFrame([(1, 10, 100)], "k long, a long, b long")
    dup = spark.createDataFrame(
        [(1, 11, 101), (1, 12, 102), (1, 12, 101)], "k long, a long, b long"
    )
    out = upsert_last_wins(target, dup, keys=("k",))
    # deterministic winner: max value struct among the duplicates
    assert _rows(out) == [(1, 12, 102)]


def test_update_join_schema_mismatch_raises(spark):
    target, updates = _fixture(spark)
    import pytest

    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_last_wins(target, updates.select("k", "a"), keys=("k",))
    with pytest.raises(ValueError, match="schema mismatch"):
        insert_ignore(target, updates.withColumn("extra", F.lit(1)), keys=("k",))
