"""Incremental-MV merge properties: state ⊕ delta ≡ full recompute
for ANY watermark split, and associativity across a 3-way split."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.plans.incremental_sql import (
    merge_user_states,
    user_aggregate_state,
)
from firefly_vcut_spark.sources.catalog import load_table


def _canon(df):
    return sorted(
        (r["user_id"], r["n"], r["qsum"], r["last_us"])
        for r in df.collect()
    )


def test_merge_equals_full_for_any_split(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    full = _canon(user_aggregate_state(ev))
    for wm in ["2024-03-15 12:00:00", "2024-09-01 00:00:00"]:
        w = F.lit(wm).cast("timestamp")
        merged = merge_user_states(
            user_aggregate_state(ev.filter(F.col("ts") <= w)),
            user_aggregate_state(ev.filter(F.col("ts") > w)),
        )
        assert _canon(merged) == full, wm


def test_merge_is_associative_over_three_slices(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w1 = F.lit("2024-04-01 00:00:00").cast("timestamp")
    w2 = F.lit("2024-08-01 00:00:00").cast("timestamp")
    a = user_aggregate_state(ev.filter(F.col("ts") <= w1))
    b = user_aggregate_state(ev.filter((F.col("ts") > w1) & (F.col("ts") <= w2)))
    c = user_aggregate_state(ev.filter(F.col("ts") > w2))
    left = merge_user_states(merge_user_states(a, b), c)
    right = merge_user_states(a, merge_user_states(b, c))
    assert _canon(left) == _canon(right) == _canon(user_aggregate_state(ev))
