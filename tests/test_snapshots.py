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


# --- segment append / merge-on-read / compaction (r4) ---


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "k bigint, v bigint")


def test_append_segment_roundtrip_and_union_read(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1, 2))
    s1 = store.append_segment("t", _df(spark, 3))
    s2 = store.append_segment("t", _df(spark, 4, 5))
    assert store.segments("t") == [s1, s2]
    assert store.current_version("t") == 1  # base untouched
    assert sorted(r.x for r in store.read("t").collect()) == [1, 2, 3, 4, 5]
    # path() must refuse: base alone is not the committed view
    with pytest.raises(ValueError):
        store.path("t")


def test_append_segment_tag_is_idempotent(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1))
    n1 = store.append_segment("t", _df(spark, 2), tag="q1_b0")
    n2 = store.append_segment("t", _df(spark, 2), tag="q1_b0")  # re-delivery
    assert n1 == n2
    assert store.segments("t") == [n1]
    assert sorted(r.x for r in store.read("t").collect()) == [1, 2]


def test_crash_between_segment_write_and_commit(spark, tmp_path):
    """An orphan segment dir (fully written, _SUCCESS present, never
    committed) is invisible to readers and never adopted: the next
    append claims a HIGHER number."""
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1))
    orphan = os.path.join(str(tmp_path), "t", "s000001")
    _df(spark, 99).write.mode("overwrite").parquet(orphan)

    for s in (store, SnapshotStore(spark, str(tmp_path))):
        assert s.segments("t") == []
        assert sorted(r.x for r in s.read("t").collect()) == [1]

    name = store.append_segment("t", _df(spark, 2))
    assert name == "s000002"  # orphan slot skipped, never silently adopted
    assert sorted(r.x for r in store.read("t").collect()) == [1, 2]


def test_crash_between_retire_and_commit_keeps_old_view(spark, tmp_path):
    """Kill inside compact() after _retire wrote _RETIRED.N but before
    the manifest flip: the retire-record is for a compaction that never
    committed — readers still see base+segments, and a later real
    compaction succeeds."""
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1))
    seg = store.append_segment("t", _df(spark, 2))
    # simulate the crash: v2 materialized + _RETIRED.2 written, no commit
    v2 = os.path.join(str(tmp_path), "t", "v2")
    _df(spark, 1, 2).write.mode("overwrite").parquet(v2)
    store._retire("t", 2, [seg])

    s2 = SnapshotStore(spark, str(tmp_path))
    assert s2.current_version("t") == 1
    assert s2.segments("t") == [seg]
    assert sorted(r.x for r in s2.read("t").collect()) == [1, 2]

    v = s2.compact("t")  # recovery: overwrites the orphan v2, commits
    assert v == 2 and s2.segments("t") == []
    assert sorted(r.x for r in s2.read("t").collect()) == [1, 2]


def test_crash_mid_compaction_half_written_base(spark, tmp_path):
    """Kill during the v2 parquet write (no _SUCCESS): readers keep
    the old view; compact() overwrites the torn dir and commits."""
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _df(spark, 1))
    store.append_segment("t", _df(spark, 2))
    torn = os.path.join(str(tmp_path), "t", "v2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00torn")

    s2 = SnapshotStore(spark, str(tmp_path))
    assert sorted(r.x for r in s2.read("t").collect()) == [1, 2]
    assert s2.compact("t") == 2
    assert sorted(r.x for r in s2.read("t").collect()) == [1, 2]


def test_vacuum_prunes_retired_segments_after_consumers_gone(spark, tmp_path):
    """Segments folded into v2 stay on disk while v1 (which referenced
    them) is retained, and are deleted once v1 is vacuumed."""
    store = SnapshotStore(spark, str(tmp_path), keep=2)
    store.write("t", _df(spark, 1))
    seg = store.append_segment("t", _df(spark, 2))
    store.compact("t")  # v2; v1 retained (keep=2) so seg must survive
    tdir = os.path.join(str(tmp_path), "t")
    assert os.path.isdir(os.path.join(tdir, seg))
    assert os.path.exists(os.path.join(tdir, "_RETIRED.2"))

    store.write("t", _df(spark, 9))  # v3: v1 pruned -> seg now orphaned
    assert not os.path.isdir(os.path.join(tdir, seg))
    assert not os.path.exists(os.path.join(tdir, "_RETIRED.2"))
    assert [r.x for r in store.read("t").collect()] == [9]


def test_read_last_wins_resolves_across_segments(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    store.write("t", _kv(spark, (1, 10), (2, 20)))
    store.append_segment("t", _kv(spark, (2, 21), (3, 30)))
    store.append_segment("t", _kv(spark, (3, 31)))
    got = {r.k: r.v for r in store.read_last_wins("t", ["k"]).collect()}
    assert got == {1: 10, 2: 21, 3: 31}
    # compaction with merge_keys folds the RESOLVED view
    store.compact("t", merge_keys=["k"])
    assert store.segments("t") == []
    got2 = {r.k: r.v for r in store.read("t").collect()}
    assert got2 == {1: 10, 2: 21, 3: 31}


def test_auto_compaction_with_merge_keys(spark, tmp_path):
    """Hitting compact_segments triggers a fold that honors last-wins
    (segment recency must not be lost by the auto path)."""
    store = SnapshotStore(spark, str(tmp_path), compact_segments=2)
    store.write("t", _kv(spark, (1, 10)))
    store.append_segment("t", _kv(spark, (1, 11)), merge_keys=["k"])
    # second append reaches the threshold -> auto-compact with keys
    store.append_segment("t", _kv(spark, (1, 12)), merge_keys=["k"])
    assert store.segments("t") == []
    assert store.current_version("t") == 2
    assert {r.k: r.v for r in store.read("t").collect()} == {1: 12}


def test_time_travel_reads_prior_version(spark, tmp_path):
    """read_version serves the table AS OF an earlier base commit
    while it remains inside the keep window, and refuses once the
    vacuum has pruned it."""
    from firefly_vcut_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "tt"), keep=2)
    store.write("t", spark.range(3).withColumnRenamed("id", "x"))
    store.write("t", spark.range(10, 15).withColumnRenamed("id", "x"))
    assert store.versions("t") == [1, 2]
    old = {r["x"] for r in store.read_version("t", 1).collect()}
    new = {r["x"] for r in store.read_version("t", 2).collect()}
    assert old == {0, 1, 2}
    assert new == {10, 11, 12, 13, 14}
    assert {r["x"] for r in store.read("t").collect()} == new
    store.write("t", spark.range(20, 22).withColumnRenamed("id", "x"))
    assert store.versions("t") == [2, 3]  # v1 vacuumed (keep=2)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.read_version("t", 1)
