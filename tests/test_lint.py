"""Plan linter: fires on each anti-pattern, silent on the registry's
tuned plans."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from firefly_vcut_spark.plans import all_queries
from firefly_vcut_spark.plans.lint import lint_plan

QS = all_queries()


def test_fires_on_cartesian(spark):
    a = spark.range(1000)
    b = spark.range(1000).withColumnRenamed("id", "id2")
    # disable auto-broadcast so the cross join plans as CartesianProduct
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        findings = lint_plan(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert any(f.startswith("cartesian-product") for f in findings), findings


def test_fires_on_row_python_udf(spark):
    plus_one = F.udf(lambda x: x + 1, T.LongType())
    df = spark.range(100).select(plus_one("id").alias("y"))
    findings = lint_plan(df)
    assert any(f.startswith("row-python-udf") for f in findings), findings


def test_fires_on_sort_merge_join(spark):
    a = spark.range(100000).withColumn("k", F.col("id") % 1000)
    b = spark.range(100000).withColumn("k", F.col("id") % 1000)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # also suppress the shuffled-hash fallback preference
        df = a.join(b.hint("merge"), "k")
        findings = lint_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert any(f.startswith("sort-merge-join") for f in findings), findings


def test_silent_on_tuned_registry_plans(spark, sf_dir):
    """The headline plans this repo ships must lint clean — the same
    properties the individual plan gates assert."""
    for name in (
        "q1_pricing_summary",
        "j1_join_archive_profile",
        "layout_zorder_files",
        "win_funnel_conversion",
        "text_char_lm_scores",
    ):
        findings = lint_plan(QS[name].fn(spark, sf_dir))
        assert findings == [], (name, findings)
