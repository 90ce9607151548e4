"""Salted join: the explicit-plan fix for skewed join keys.

When one join key carries a disproportionate share of a huge fact
table (hot users, null-ish sentinel keys, power-law ids), a plain
shuffle join lands that key's every row in ONE reducer task and the
stage runs at the speed of its slowest straggler. Salting splits each
key's rows across ``n_salts`` reducers: the fact side appends a
deterministic salt in [0, n_salts) hashed from a row-unique column,
and the (much smaller, but not broadcast-small) dim side replicates
each row once per salt value, so (key, salt) spreads every hot key
over n_salts tasks. Equality on (key, salt) preserves exact inner /
left-outer join semantics: every fact row still meets exactly the one
dim replica carrying its salt.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) does this
adaptively for sort-merge joins; the explicit form is the one you
reach for when the skew is known ahead of time, when the join is a
shuffled hash join, or when the same trick must also spread a skewed
aggregation. Replication factor is the cost knob: the dim shuffle
grows n_salts-fold, so pick n_salts ~ (hot-key rows / target task
rows), not the cluster width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with ``n_salts``-way salting.

    ``salt_src`` names a fact column that is unique-ish per row (an
    event/row id); the salt is ``pmod(xxhash64(salt_src), n_salts)``
    so re-runs land rows on the same reducer (deterministic plans,
    stable tests). The dim side explodes one replica per salt value.
    Only inner and left(-outer) joins keep exact semantics under
    replication; right/full would duplicate unmatched dim rows.
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
