"""SCD2 history invariants: versions tile each user's timeline with
no gaps/overlaps, adjacent versions differ in the tracked attribute,
and the AS OF lookup returns at most one version per user —
containing the probe instant."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.plans.scd_sql import scd2_history
from firefly_vcut_spark.sources.catalog import load_table


def _hist(spark, sf_dir):
    return scd2_history(load_table(spark, sf_dir, "events"))


def test_versions_are_contiguous_and_tile_the_timeline(spark, sf_dir):
    h = _hist(spark, sf_dir).collect()
    by_user: dict = {}
    for r in h:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to"] == nxt["valid_from"], user  # no gap
            assert prev["attr"] != nxt["attr"], user  # real change
        assert rows[-1]["valid_to"] is None  # current version open


def test_change_counts_sum_to_event_count(spark, sf_dir):
    h = _hist(spark, sf_dir)
    total = h.agg(F.sum("n_changes")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_asof_returns_at_most_one_version_per_user(spark, sf_dir):
    from firefly_vcut_spark.plans import all_queries

    q = all_queries()["t_scd2_asof_lookup"]
    rows = q.fn(spark, sf_dir).collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))
    assert rows, "no user had history at the probe instant"


def test_scd2_apply_slices_equals_full_derivation(spark, sf_dir):
    """Applying the change log in three time-ordered CDC batches
    (scd2_apply) produces exactly the history scd2_history derives
    from the full log in one pass."""
    from pyspark.sql import functions as F

    from firefly_vcut_spark.plans.scd_sql import scd2_apply

    ev = load_table(spark, sf_dir, "events")
    row = ev.selectExpr(
        "CAST(percentile(unix_micros(ts), 0.33) AS LONG)",
        "CAST(percentile(unix_micros(ts), 0.66) AS LONG)",
    ).collect()[0]
    t1, t2 = row[0], row[1]
    slices = [
        ev.filter(F.unix_micros("ts") <= t1),
        ev.filter((F.unix_micros("ts") > t1) & (F.unix_micros("ts") <= t2)),
        ev.filter(F.unix_micros("ts") > t2),
    ]
    hist = None
    for sl in slices:
        hist = scd2_apply(hist, sl).localCheckpoint()
    def canon(df):
        return sorted(
            (
                r["user_id"],
                r["version"],
                r["attr"],
                r["valid_from"],
                r["valid_to"],
                r["n_changes"],
            )
            for r in df.collect()
        )
    assert canon(hist) == canon(scd2_history(ev))
