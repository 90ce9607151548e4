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


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    return all_queries()[name]
