"""Temporal operator edge cases: as-of ties at equal timestamps,
no-preceding-row NULLs, and inclusive range-join boundaries."""

from __future__ import annotations

from firefly_vcut_spark.operators.temporal import asof_join, range_join_bucketed


def test_asof_edges(spark):
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 20), (2, 7), (3, 9)],
        "k long, lts long",
    )
    right = spark.createDataFrame(
        [(1, 10, "at10"), (1, 15, "at15"), (2, 8, "at8")],
        "k long, rts long, v string",
    )
    got = {
        (r.k, r.lts): r.v
        for r in asof_join(left, right, "k", "lts", "rts", ["v"]).collect()
    }
    assert got == {
        (1, 5): None,      # nothing precedes
        (1, 10): "at10",   # tie at equal ts is visible (inclusive)
        (1, 20): "at15",   # latest preceding wins
        (2, 7): None,      # right row is later
        (3, 9): None,      # key absent on the right
    }


def test_range_join_inclusive_bounds(spark):
    probes = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 150), (3, 1, 151), (4, 1, 99), (5, 2, 120)],
        "pid long, k long, ts long",
    )
    intervals = spark.createDataFrame(
        [(10, 1, 100, 150), (20, 2, 0, 119)],
        "iid long, k long, s long, e long",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_bucketed(
            probes, intervals, key="k", probe_ts="ts",
            interval_start="s", interval_end="e",
            bucket_width=10, max_interval=200,
        ).collect()
    }
    # both bounds inclusive; 151 and 99 fall outside; probe 5 misses
    assert got == {(1, 10), (2, 10)}


def test_range_join_interval_spanning_many_buckets(spark):
    probes = spark.createDataFrame([(1, 1, 95)], "pid long, k long, ts long")
    intervals = spark.createDataFrame([(10, 1, 0, 100)], "iid long, k long, s long, e long")
    got = range_join_bucketed(
        probes, intervals, key="k", probe_ts="ts",
        interval_start="s", interval_end="e",
        bucket_width=7, max_interval=150,
    ).collect()
    assert len(got) == 1
