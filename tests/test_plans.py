"""Physical-plan quality gate: the optimizations the 100 TB design
depends on must actually appear in the executed plans — pushed
filters, broadcast joins, TakeOrderedAndProject top-k, partial
(map-side) argmax aggregation, and full-width scoring parallelism."""

from __future__ import annotations

from firefly_vcut_spark.plans import all_queries

QS = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_s1_filters_and_projection_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "s1_scan_pushdown")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_discount)" in plan or "GreaterThan(l_discount" in plan
    # column pruning: the scan must not read unused columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_tax" not in read_schema


def test_j1_broadcasts_the_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j1_join_archive_profile")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_t1_plans_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "t1_topk_recent_archives")
    assert "TakeOrderedAndProject" in plan


def test_flagship_partial_argmax_and_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "w1_flagship_occurrence_scan")
    assert "partial_max_by" in plan  # map-side combine before shuffle
    assert "BroadcastHashJoin" in plan  # songs joined on k, broadcast
    assert plan.count("Exchange") <= 4  # window + repartition + argmax


def test_anti_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j7_anti_join_unknown_bvids")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "partial_" in plan  # map-side partial agg before exchange
