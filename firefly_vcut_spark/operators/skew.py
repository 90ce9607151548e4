"""Skew- and shuffle-management utilities for the 100 TB posture.

AQE's skew-join splitting handles most cases at runtime; these cover
the two patterns AQE cannot fix:

- ``salted_aggregate`` — a hot GROUP BY key (one vtuber's million
  recordings, one song's candidate flood) overloads a single reducer.
  Two-phase aggregation over a salted key spreads the hot key across
  ``salt`` reducers, then merges the partials. Correct for any
  algebraic aggregate (the caller provides partial + merge exprs).
- ``salted_broadcast_left`` — a skewed fact side joining a *small*
  dim should be a broadcast join (no shuffle of the skewed side at
  all); the helper exists to make the choice explicit and assert the
  dim is actually broadcastable.

Bucketed co-located joins (two big tables repeatedly joined on the
same key) are storage-layout work, not an operator: see
tests/test_scale.py::test_bucketed_join_avoids_shuffle for the
bucketBy write + shuffle-free sort-merge join recipe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys.

    Phase 1 groups by (keys…, salt) computing ``partial_aggs``;
    phase 2 groups by keys merging with ``merge_aggs`` (referring to
    the phase-1 output columns). Example::

        salted_aggregate(
            df, ["song_id"],
            partial_aggs={"c": F.count(F.lit(1)), "s": F.sum("score")},
            merge_aggs={"n": F.sum("c"), "total": F.sum("s")},
        )
    """
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % salt
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in merge_aggs.items()])


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, on: Sequence[str]) -> DataFrame:
    """Join a (possibly skewed) fact to a small dim without shuffling
    the fact side: explicit broadcast of the dim. Raises early if the
    dim is implausibly large to broadcast (> 10M rows)."""
    n = dim.count()
    if n > 10_000_000:
        raise ValueError(
            f"dim has {n} rows; too large to broadcast — bucket or let "
            "AQE skew-split a shuffle join instead"
        )
    return fact.join(F.broadcast(dim), list(on), "left")


SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted SHUFFLED join — for the case both helpers above decline:
    a skewed fact joining a dim too big to broadcast.

    The fact appends salt = ``pmod(xxhash64(salt_src), n_salts)``
    (``salt_src`` is a row-unique fact column, so re-runs land rows on
    the same reducer — deterministic plans, stable tests); the dim
    replicates one copy per salt value, so equality on (key, salt)
    spreads each hot key's rows over ``n_salts`` reducers while every
    fact row still meets exactly the one replica carrying its salt.
    Exact for inner and left joins; right/full would duplicate
    unmatched dim rows, so they are rejected. Replication is the cost
    knob: the dim shuffle grows n_salts-fold, so pick n_salts ~
    (hot-key rows / target task rows), not the cluster width.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    f = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    d = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # shuffle_hash hint: the whole point is a shuffled join spread over
    # (key, salt); broadcasting the replicated dim would both defeat
    # the demonstration and waste n_salts x driver memory.
    return f.join(d.hint("shuffle_hash"), on=[key, SALT_COL], how=how).drop(SALT_COL)


def widen_if_narrow(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input's planned partition
    count is below the session's core count — the scale-adaptive form
    of the ``repartition(defaultParallelism)`` parallelism pin the
    CPU-heavy operators (MinHash fan-out, quantizer assignment, n-gram
    explode …) used to hard-code.

    Rationale (optimization guide §2.4 "remove shuffles outright"): a
    blind keyless ``repartition(n)`` is a full exchange of its input —
    plus the sort-before-repartition each retried map task pays — that
    exists only because a LOCAL scale factor arrives as one small
    parquet file whose scan yields fewer splits than cores, which
    would serialize the expensive per-row stage above it. On a real
    cluster the same table arrives as thousands of >=128 MB files, the
    scan alone yields far more splits than ``defaultParallelism``, and
    the pin degenerates to shuffling 100 TB round-robin for nothing.

    Mode resolution (override with ``SPARK_GRAFT_WIDEN``):

    - ``local[...]`` master (the only place the narrow-scan problem
      exists — a bench/test SF is one small file; ``local-cluster``
      masters simulate a real cluster and take the auto path): widen
      unconditionally. Zero probe overhead, byte-identical plan to the
      historical pin, so the driver's bench stays comparable.
    - any cluster master: probe the ACTUAL planned partition count and
      widen only if the input really is narrower than the cores. At
      100 TB the scan yields thousands of splits, so the exchange
      simply disappears. The probe is restricted to EXCHANGE-FREE
      inputs (scan/project/filter/generate pipelines — exactly where
      the narrow-file problem lives): for a plan that acquires an
      Exchange, ``df.rdd`` under AQE materializes the upstream query
      stages eagerly (the shuffle/broadcast jobs run at probe time and
      their work is discarded when the returned DataFrame executes),
      and a shuffle's output width is ``spark.sql.shuffle.partitions``
      anyway — a knob the cluster sizes to its own width. Narrowness
      is decided from a WHITELIST of narrow physical nodes over the
      pre-preparation ``sparkPlan`` (exchanges are only inserted by
      EnsureRequirements later, so joins/aggregates are recognised by
      their own nodes; an unknown node fails safe to "don't probe").
      For whitelisted plans ``df.rdd`` only plans the scan under the
      live ``maxPartitionBytes``; no job runs (~0.1 s of driver
      time).

    ``SPARK_GRAFT_WIDEN=never`` forces the no-op, ``=always`` the
    unconditional exchange, ``=auto`` the probe — useful for A/B
    measurement on either side.
    """
    import os
    import re

    sc = df.sparkSession.sparkContext
    mode = os.environ.get("SPARK_GRAFT_WIDEN")
    if mode is None:
        mode = "always" if re.fullmatch(r"local(\[.*\])?", sc.master) else "auto"
    if mode == "never":
        return df
    n = target or sc.defaultParallelism
    if mode == "always":
        return df.repartition(n)
    if not _probe_is_safe(df):
        return df
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


# Physical nodes that are narrow (no exchange, no broadcast, no
# subquery) — the only plans widen_if_narrow's auto probe may touch.
# Anything else (joins, aggregates, windows, sorts, limits, explicit
# exchanges, unknown future nodes) fails safe: no probe, no widen.
_NARROW_NODES = frozenset(
    {
        "FileScan",
        "BatchScan",
        "Scan",
        "LocalTableScan",
        "Range",
        "Project",
        "Filter",
        "Generate",
        "Coalesce",
        "Union",
        "ColumnarToRow",
        "RowToColumnar",
        "InputAdapter",
        "WholeStageCodegen",
    }
)


def _probe_is_safe(df: DataFrame) -> bool:
    """True iff every node of the pre-preparation physical plan is in
    the narrow whitelist — i.e. executing ``df.rdd`` plans the scan and
    nothing else (no AQE stage materialization can fire)."""
    plan = df._jdf.queryExecution().sparkPlan().toString()
    for raw in plan.splitlines():
        line = raw.lstrip(" :+-*")
        if not line:
            continue
        node = line.split(" ", 1)[0].split("(", 1)[0]
        if node and node not in _NARROW_NODES:
            return False
    return True
