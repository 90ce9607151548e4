"""Named-query registry.

Each registered query is a pair:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-native program, and
- ``sql`` — an equivalent DuckDB SQL string over the same parquet
  views (None for ops that aren't SQL-expressible; the driver then
  records a weaker rows-only check).

The registry is the single source for ``__spark_entry__.queries()`` /
``oracle_sql()``, for ``bench.py``, and for the pytest oracle suite.

Output discipline (correctness-hash parity):
- every output column is explicitly aliased AND cast to one of
  {BIGINT, DOUBLE, VARCHAR} in BOTH engines (driver compares schemas);
- aggregated doubles are ``round(x, 4)`` on both sides so partial-agg
  summation order can't flip the hash;
- timestamps leave queries as formatted strings (UTC semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    sql: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    sql: str | None = None,
    tags: Iterable[str] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver executes queries under ITS session; pin the
            # session semantics oracle parity depends on (UTC tz for
            # unix_timestamp / date_format) before building the plan
            from firefly_vcut_spark.session import tune_for_oracle

            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        wrapped.__doc__ = fn.__doc__
        wrapped.__name__ = fn.__name__
        _REGISTRY[name] = Query(
            name=name, fn=wrapped, sql=sql, tags=tuple(tags), doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every plan module for its registration side effects."""
    import firefly_vcut_spark.plans.relational  # noqa: F401
    import firefly_vcut_spark.plans.functions_sql  # noqa: F401
    import firefly_vcut_spark.plans.flagship  # noqa: F401
    import firefly_vcut_spark.plans.statemachine  # noqa: F401
    import firefly_vcut_spark.plans.extensions  # noqa: F401
    import firefly_vcut_spark.plans.windows_sql  # noqa: F401
    import firefly_vcut_spark.plans.sources_sql  # noqa: F401
    import firefly_vcut_spark.plans.relational2  # noqa: F401
    import firefly_vcut_spark.plans.analytics  # noqa: F401
    import firefly_vcut_spark.plans.analytics_tpch  # noqa: F401
    import firefly_vcut_spark.plans.pipeline_ops  # noqa: F401
    import firefly_vcut_spark.plans.temporal_sql  # noqa: F401
    import firefly_vcut_spark.plans.scale_joins  # noqa: F401
    import firefly_vcut_spark.plans.layout_sql  # noqa: F401
    import firefly_vcut_spark.plans.sketches_sql  # noqa: F401
    import firefly_vcut_spark.plans.winnow_sql  # noqa: F401
    import firefly_vcut_spark.plans.timeseries_sql  # noqa: F401
    import firefly_vcut_spark.plans.graph_sql  # noqa: F401
    import firefly_vcut_spark.plans.semdedup_sql  # noqa: F401
    import firefly_vcut_spark.plans.incremental_sql  # noqa: F401
    import firefly_vcut_spark.plans.scd_sql  # noqa: F401
    import firefly_vcut_spark.plans.regression_sql  # noqa: F401
    import firefly_vcut_spark.plans.nb_sql  # noqa: F401
    import firefly_vcut_spark.plans.affinity_sql  # noqa: F401
    import firefly_vcut_spark.plans.dsir_sql  # noqa: F401
    import firefly_vcut_spark.plans.er_sql  # noqa: F401
    import firefly_vcut_spark.plans.bpe_sql  # noqa: F401
    import firefly_vcut_spark.plans.rag_sql  # noqa: F401
    import firefly_vcut_spark.plans.search_sql  # noqa: F401
    import firefly_vcut_spark.plans.decon_sql  # noqa: F401
    import firefly_vcut_spark.plans.kmeans_sql  # noqa: F401
    import firefly_vcut_spark.plans.unigram_sql  # noqa: F401
    import firefly_vcut_spark.plans.audit_sql  # noqa: F401
    import firefly_vcut_spark.plans.drift_sql  # noqa: F401
    import firefly_vcut_spark.plans.ann_eval_sql  # noqa: F401


# Registry-order insurance (VERDICT r1 item 8): the driver records the
# FIRST 50 registry entries into CORRECTNESS_r{N}.json. This list pins
# the 50-slot window by construction to hold at least one representative
# of every SURVEY §2 family AND every extension family (streaming
# windows, stream-static joins, temporal as-of/range joins, corpus prep,
# extended aggregates, window functions), so driver truncation can never
# hide a whole-family regression. Everything else follows in
# registration order. tests/test_oracle.py gates family coverage.
# Round-8 rotation (VERDICT r7 item 2): 120 of 194 registry queries had
# never appeared in a driver-recorded CORRECTNESS_r*.json after 7 rounds
# of the driver's 50-slot window. This window keeps 10 fixed family
# anchors (the 8 families whose every member is already driver-recorded
# — s/t/set/fjson/w2/er/rag/ml — plus the w1 flagship and the headline
# minhash-LSH dedup) and fills the other 40 slots with never-recorded
# names, at least one per remaining family. Rotate again next round.
_FRONT50 = [
    # -- fixed anchors (families with no never-recorded member) --
    "s1_scan_pushdown",
    "t1_topk_recent_archives",
    "set_union_accumulate",
    "fjson_props_extract",
    "w2_watermark_incremental",
    "er_blocked_name_match",
    "rag_context_assembly",
    "ml_kmeans_full_lloyd",
    "w1_flagship_occurrence_scan",
    "dedup_minhash_lsh",
    # -- never-driver-recorded rotation (round 8) --
    "a2_song_video_watermark",
    "p10_pair_anti_join_before_scan",
    "f11_chunk_ranges",
    "layout_pruning_compare",
    "search_bm25_mrr",
    "st_click_purchase_pairs",
    "w_hopping_counts",
    "w_session_windows",
    "t_topk_per_group",
    "t_scd2_asof_lookup",
    "j3_fact_3way_join",
    "j5_left_join_keep_unbridged",
    "j_bloom_prefilter",
    "j_salted_skew",
    "mm_audio_wav_features",
    "mm_video_rvid_frames",
    "ann_ivf_recall",
    "ann_pq_rerank_topk",
    "dedup_allpairs_prefix",
    "dedup_lsh_recall",
    "corpus_canonical_docs",
    "corpus_cluster_safe_split",
    "corpus_quality_filter_chain",
    "corpus_pii_redaction",
    "corpus_stratified_sample",
    "text_unigram_piece_scores",
    "text_bpe_encode_docs",
    "text_inverted_index",
    "text_nb_langid_confusion",
    "win_lead_lag_deltas",
    "win_sessionize_ids",
    "win_zscore_anomalies",
    "win_scd2_history",
    "agg_exact_quantile_twopass",
    "agg_k_anonymity_audit",
    "corpus_pipeline_audit_card",
    "agg_retention_cohorts",
    "agg_graph_triangles",
    "q2_min_acctbal_supplier",
    "q10_returned_items",
]


def all_queries() -> dict[str, Query]:
    _load_all()
    missing = [n for n in _FRONT50 if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_FRONT50 names not registered: {missing}")
    rest = [n for n in _REGISTRY if n not in set(_FRONT50)]
    return {n: _REGISTRY[n] for n in [*_FRONT50, *rest]}


def get_query(name: str) -> Query:
    return all_queries()[name]
