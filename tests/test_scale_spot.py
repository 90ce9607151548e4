"""sf0.1 correctness spot-gate (r4 verdict task 8): the full oracle
sweep runs at sf0.001, where scale-dependent wrongness — AQE coalesce
changing a nondeterministic tie, arithmetic overflow at bigger counts,
a partition-sensitive float sum — cannot show up. This gate re-runs a
ROTATING 20-query sample at sf0.1 against the same DuckDB oracles.

Rotation is deterministic per commit (seeded by git HEAD, overridable
with SPARK_GRAFT_SPOT_SEED), so any given run is reproducible while
successive commits sweep different corners of the registry.

Oracle twins that deliberately emulate engine internals (bit-parallel
LCS, per-pair Jaccard re-verification) take minutes at sf0.1; a
watchdog interrupts any oracle beyond the budget and the query is
SKIPPED (visibly), not silently passed — the sample draws a
replacement first, so the gate still checks 20 queries worth of
budget."""

from __future__ import annotations

import os
import random
import subprocess

import pytest

from firefly_vcut_spark.oracle import compare
from firefly_vcut_spark.plans import all_queries

QUERIES = all_queries()
SF01 = os.environ.get("SPARK_GRAFT_SPOT_SF_DIR", "/root/testdata/sf0.1")

# oracle twins measured in minutes at sf0.1 (bench.py's r2-msmt list):
# excluded up front — the per-query watchdog would only burn budget on
# them; their sf0.1 execution is covered by bench.py every round.
_HEAVY_ORACLES = {
    "w1_flagship_occurrence_scan",
    "w1_lev_approx_scan",
    "dedup_minhash_lsh",
    "dedup_lsh_then_verify",
    "corpus_canonical_docs",
    "corpus_dedup_components",
    "corpus_pack_sequences",
    "corpus_incremental_dedup",
    "dedup_winnow_pairs",
    "dedup_ngram_jaccard",
    "dedup_allpairs_prefix",
}

_ORACLE_BUDGET_S = float(os.environ.get("SPARK_GRAFT_SPOT_BUDGET", "20"))
_SAMPLE_N = 20


def _seed() -> int:
    env = os.environ.get("SPARK_GRAFT_SPOT_SEED")
    if env is not None:
        return int(env)
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=10,
        ).stdout.strip()
        return int(head[:8], 16)
    except Exception:
        return 0


def test_heavy_oracle_list_is_current():
    """Every excluded name must still be a registry query — a renamed
    query would otherwise silently rejoin the sample."""
    assert _HEAVY_ORACLES <= set(QUERIES), sorted(
        _HEAVY_ORACLES - set(QUERIES)
    )


def _sample() -> list[str]:
    eligible = sorted(
        n
        for n, q in QUERIES.items()
        if q.sql is not None and n not in _HEAVY_ORACLES
    )
    rng = random.Random(_seed())
    return sorted(rng.sample(eligible, min(_SAMPLE_N, len(eligible))))


@pytest.mark.parametrize("name", _sample())
def test_sf01_spot_oracle(spark, name):
    """Coarse wall-clock watchdog around the whole comparison
    (compare() hides its DuckDB connection, so interrupt() isn't
    reachable): a blown budget SKIPS visibly rather than hanging CI
    or silently passing."""
    import threading

    q = QUERIES[name]
    result_box: list = []
    err_box: list = []

    def run():
        try:
            result_box.append(compare(name, spark, SF01, q.fn, q.sql))
        except Exception as e:  # noqa: BLE001 - surfaced via err_box
            err_box.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(_ORACLE_BUDGET_S * 6)
    if t.is_alive():
        pytest.skip(f"{name}: sf0.1 comparison exceeded watchdog budget")
    if err_box:
        raise err_box[0]
    res = result_box[0]
    assert res.ok, f"{name} at sf0.1: {res.detail}"
