"""Crash-safety tests for the versioned snapshot store — the
write-new-then-atomic-swap sink standing in for the reference's
Postgres transactions (db/recording.py:241-300, db/occurrence.py:22-51)
without a transactional table format (VERDICT r1 item 6).

The key property: a crash at ANY point between materializing vN+1 and
flipping the _LATEST pointer leaves the previous committed snapshot
fully readable, and recovery overwrites the orphan."""

import os

import pytest

from firefly_vcut_spark.sources.snapshots import SnapshotStore


def _df(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def test_write_read_roundtrip(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    assert not store.exists("t")
    v = store.write("t", _df(spark, 1, 2, 3))
    assert v == 1 and store.current_version("t") == 1
    assert sorted(r.x for r in store.read("t").collect()) == [1, 2, 3]
    v = store.write("t", _df(spark, 4))
    assert v == 2
    assert [r.x for r in store.read("t").collect()] == [4]


def test_crash_between_write_and_swap_keeps_old_snapshot(spark, tmp_path):
    """Simulated kill after the full vN+1 parquet write (including
    Spark's _SUCCESS marker) but before the pointer flip: readers must
    still see vN, and a fresh store instance must agree."""
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1, 2))

    # the crash: v2 is fully materialized but _commit never runs
    orphan = os.path.join(str(tmp_path), "t", "v2")
    _df(spark, 99).write.mode("overwrite").parquet(orphan)
    assert os.path.exists(os.path.join(orphan, "_SUCCESS"))

    for s in (store, SnapshotStore(spark, str(tmp_path))):
        assert s.current_version("t") == 1
        assert sorted(r.x for r in s.read("t").collect()) == [1, 2]


def test_recovery_overwrites_orphan_version(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1))
    orphan = os.path.join(str(tmp_path), "t", "v2")
    _df(spark, 99).write.mode("overwrite").parquet(orphan)

    # next write claims v2, replacing the orphan, then commits
    v = SnapshotStore(spark, str(tmp_path)).write("t", _df(spark, 7))
    assert v == 2
    assert [r.x for r in store.read("t").collect()] == [7]


def test_crash_during_manifest_replace_is_atomic(spark, tmp_path):
    """A leftover manifest tmp file (crash inside _commit before
    os.replace) must not confuse any reader."""
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1))
    tmp = os.path.join(str(tmp_path), "t", "_LATEST.tmp.12345")
    with open(tmp, "w") as f:
        f.write("2")
    s2 = SnapshotStore(spark, str(tmp_path))
    assert s2.current_version("t") == 1
    assert s2.tables() == ["t"]


def test_vacuum_keeps_recent_versions(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path), keep=2)
    for i in range(1, 5):
        store.write("t", _df(spark, i))
    vdirs = sorted(
        d for d in os.listdir(tmp_path / "t") if d.startswith("v") and d[1:].isdigit()
    )
    assert vdirs == ["v3", "v4"]
    assert [r.x for r in store.read("t").collect()] == [4]


def test_read_missing_table_raises(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    with pytest.raises(FileNotFoundError):
        store.path("nope")
