"""firefly_vcut_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing semantics of
the reference pipeline (YangchenYe323/firefly-vcut) as idiomatic Spark
DataFrame programs over Parquet, extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns).

Layout:
    session        SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, adaptive skew join).
    schemas        Explicit StructType schemas for every input table.
    sources        Table catalog + domain-fixture builders (the
                   reference's domain schema re-hosted on the driver's
                   synthetic star schema).
    functions      Column-function library (scalar, similarity, text,
                   vector math).
    operators      Composed operators: fuzzy sliding-window scan, merge/
                   upsert recipes, dedup family, ANN search, multimodal.
    plans          The named-query registry: every SURVEY.md §2 operator
                   as a (Spark callable, DuckDB oracle SQL) pair.
    streaming      Structured Streaming wrappers (incremental batch via
                   Trigger.AvailableNow, watermarked windowed aggs).
"""

__version__ = "0.1.0"
