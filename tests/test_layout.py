"""Z-order layout: Morton interleave correctness, the multi-dimensional
pruning property the layout exists for, and the no-sort plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.layout import zvalue, zvalue_sql
from firefly_vcut_spark.plans import all_queries

QS = all_queries()


def _morton(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_morton(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (149, 245), (37, 201)]
    df = spark.createDataFrame(pairs, "a int, b int").withColumn(
        "z", zvalue(F.col("a"), F.col("b"), 8)
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    for a, b in pairs:
        assert got[(a, b)] == _morton(a, b), (a, b)


def test_zvalue_sql_matches_column_expr(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT a, b, {zvalue_sql('a', 'b', 8)} AS z FROM "
        "(SELECT unnest([0, 1, 255, 170, 149]) a, unnest([0, 1, 255, 85, 245]) b)"
    ).fetchall()
    for a, b, z in rows:
        assert z == _morton(a, b), (a, b)


def test_zorder_files_are_narrow_rectangles(spark, sf_dir):
    """The point of the layout: each z-file covers at most a quarter of
    each dimension's range (vs a 1-D layout where the unsorted
    dimension spans the full range in EVERY file)."""
    rows = QS["layout_zorder_files"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_ub - r.min_ub <= 64, r
        assert r.max_vb - r.min_vb <= 64, r


def test_zorder_prunes_probes_on_either_dimension(spark, sf_dir):
    """A probe rectangle on EITHER single dimension must touch a small
    fraction of files. file_id = (vb7, ub7, vb6, ub6, vb5), so vb<32
    structurally confines the probe to ≤4 of 32 file ids, and ub<64 to
    ≤8 — the footer min/max can only shrink that set further."""
    rows = QS["layout_zorder_files"].fn(spark, sf_dir).collect()
    n_files = len(rows)
    vb_probe = [r for r in rows if r.min_vb < 32]
    ub_probe = [r for r in rows if r.min_ub < 64]
    assert len(vb_probe) <= 4
    assert len(ub_probe) <= 8
    # structural confinement: ub<64 → file bits 3,1 (ub7, ub6) zero
    assert {r.file_id for r in ub_probe} <= {0, 1, 4, 5, 16, 17, 20, 21}
    assert n_files >= 4  # the data actually spreads across the curve


def test_zorder_plan_has_no_sort_single_shuffle(spark, sf_dir):
    df = QS["layout_zorder_files"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan
    assert plan.count("Exchange") == 1  # the groupBy(file_id) only
    assert "partial_" in plan  # map-side combine before that shuffle


def test_zorder_write_prune_read_roundtrip(spark, sf_dir, tmp_path):
    """End-to-end: physically write the z-ordered layout
    (partitionBy(file_id), z-sorted within partitions), prune files
    from the layout stats for a vb-probe, and read ONLY those files —
    same answer as the unpruned filter, with partition pruning proven
    in the scan plan."""
    from firefly_vcut_spark.operators.layout import (
        prune_files_for_probe,
        zorder_assign,
    )
    from firefly_vcut_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "zorder_events")
    (
        zorder_assign(events)
        .repartition("file_id")
        .sortWithinPartitions("z")
        .write.partitionBy("file_id")
        .parquet(path)
    )
    stats = QS["layout_zorder_files"].fn(spark, sf_dir).collect()
    keep = prune_files_for_probe(stats, vb_range=(0, 31))
    assert 0 < len(keep) < len(stats)  # pruning actually drops files

    back = spark.read.parquet(path)
    probe = F.col("vb").between(0, 31)
    full_ids = {r.event_id for r in back.filter(probe).select("event_id").collect()}
    pruned_df = back.filter(F.col("file_id").isin(keep) & probe)
    pruned_ids = {r.event_id for r in pruned_df.select("event_id").collect()}
    assert pruned_ids == full_ids

    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "file_id" in plan.split("PartitionFilters:")[1].splitlines()[0]


def test_pruning_compare_layout_ordering(spark):
    """The comparison the query exists to make: z-order prunes BOTH
    single-dimension probes; linear prunes only its sort dimension (a
    vb probe scans every file and every row); unclustered prunes
    neither. Pinned to sf0.01: the probe bands need a populated
    user_id range ≥ 80 (sf0.001 tops out at 14, where every layout
    degenerates to a handful of full-span files and there is nothing
    to compare)."""
    sf_dir = "/root/testdata/sf0.01"
    rows = {r.layout: r for r in QS["layout_pruning_compare"].fn(spark, sf_dir).collect()}
    z, lin, unc = rows["zorder"], rows["linear_ub"], rows["unclustered"]
    # unclustered: every probe touches every file
    assert unc.ub_files == unc.n_files and unc.vb_files == unc.n_files
    # linear on ub: great on ub, useless on vb
    assert lin.ub_files <= max(2, lin.n_files // 4)
    assert lin.vb_files == lin.n_files and lin.vb_rows == unc.vb_rows
    # z-order: strictly prunes BOTH dimensions (files AND rows)
    assert z.ub_files < z.n_files and z.vb_files < z.n_files
    assert z.vb_files <= max(4, z.n_files // 4)  # structural vb confinement
    assert z.vb_rows < lin.vb_rows and z.ub_rows < unc.ub_rows


def test_zvalue_sql_exhaustive_low_bits():
    """Exhaustive 4-bit interleave check (256 pairs) plus the 8-bit
    corners, against the Python reference — both engines share this
    SQL shape so one engine-side sweep pins the arithmetic."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT a, b, {zvalue_sql('a', 'b', 4)} AS z "
        "FROM range(16) r1(a), range(16) r2(b)"
    ).fetchall()
    assert len(rows) == 256
    for a, b, z in rows:
        assert z == _morton(a, b, 4), (a, b)
    corners = duckdb.sql(
        f"SELECT a, b, {zvalue_sql('a', 'b', 8)} AS z FROM "
        "(SELECT unnest([0, 255, 1, 128]) a, unnest([255, 0, 128, 1]) b)"
    ).fetchall()
    for a, b, z in corners:
        assert z == _morton(a, b, 8), (a, b)
