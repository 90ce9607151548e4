"""Invariants for the embedding-eval queries (plans/ann_eval_sql.py)
beyond oracle parity: recall bounds, fixed query-sample size, and the
decon flag set's disjointness from the eval suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from firefly_vcut_spark.plans import all_queries
from firefly_vcut_spark.plans.ann_eval_sql import _EVAL_PRED, _Q_PRED, _TAU
from firefly_vcut_spark.sources.catalog import load_table


def test_matryoshka_recall_bounds_and_query_count(spark, sf_dir):
    rows = all_queries()["ann_matryoshka_recall"].fn(spark, sf_dir).collect()
    n_queries = (
        load_table(spark, sf_dir, "embeddings").filter(F.expr(_Q_PRED)).count()
    )
    assert len(rows) == n_queries > 0
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall"] - r["n_hits"] / 5) < 1e-9


def test_matryoshka_truncation_loses_some_recall(spark, sf_dir):
    """16-of-64 dims on near-orthogonal synthetic vectors must not be
    a perfect index — if mean recall were 1.0 the eval would be
    measuring nothing."""
    rows = all_queries()["ann_matryoshka_recall"].fn(spark, sf_dir).collect()
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert 0.0 < mean < 1.0


def test_semantic_decon_flags_are_trainside_and_above_tau(spark, sf_dir):
    out = all_queries()["corpus_semantic_decon"].fn(spark, sf_dir).collect()
    eval_ids = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.expr(_EVAL_PRED))
        .select("vec_id")
        .collect()
    }
    for r in out:
        assert r["vec_id"] not in eval_ids
        assert r["max_cos"] >= _TAU
        assert r["n_eval_hits"] >= 1
