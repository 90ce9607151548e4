from firefly_vcut_spark.plans.registry import Query, all_queries, get_query, query

__all__ = ["Query", "all_queries", "get_query", "query"]
