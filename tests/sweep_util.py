"""Shared driver-side thread pool for the full-registry sweeps.

Three tests execute every registry query end-to-end (the sf0.001
oracle sweep, the vacuity branch audit, the sf0.1 dilution gate). At
gate scale each query's wall is dominated by Spark's fixed per-job
launch latency, not compute, so running them back-to-back leaves the
executor cores idle almost all the time. Spark's scheduler happily
runs several jobs at once inside one application (optimization guide
§2.6 "overlap independent jobs"): submitting the independent per-query
checks from a small driver thread pool overlaps those latencies and
cuts each sweep's wall ~4-6x — which is what keeps the whole suite
inside the driver's verify window (r11 VERDICT item 4: `tests_ok`
read false only because the 45-50 min suite outlived the window).

Queries whose operators share a module-level retire-on-next-call
persist queue (_LIVE_*_CACHES in operators/text.py, operators/
unigram.py, operators/graph.py, plans/search_sql.py) are grouped so
same-family queries run sequentially within one pool task: two
concurrent same-family queries could retire each other's live cache
mid-plan (still correct — lineage recomputes — but it would re-run
the heavy subtree and defeat the overlap). Distinct families share
nothing: oracle.compare() builds a fresh DuckDB connection per call
and query builds never mutate session conf.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable
from concurrent.futures import ThreadPoolExecutor

SWEEP_THREADS = int(os.environ.get("SPARK_GRAFT_SWEEP_THREADS", "8"))


def cache_family(name: str) -> str | None:
    """Queries sharing a module-level retire-on-next-call cache queue
    — must not run concurrently with each other (see module docstring)."""
    if "unigram" in name or "tokenizer" in name:
        return "unigram"
    if "graph" in name:
        return "graph"
    if "bm25" in name or name.startswith("search_"):
        return "search"
    if "dsir" in name:
        return "dsir"
    return None


def run_grouped(
    names: Iterable[str],
    check: Callable[[str], object],
    threads: int = SWEEP_THREADS,
) -> dict[str, object]:
    """Run ``check(name)`` for every name on a thread pool, cache
    families grouped into one sequential task each. Returns
    {name: result-or-captured-exception}; the caller decides how to
    surface failures (exceptions are captured, never swallowed)."""
    groups: dict[str, list[str]] = {}
    for n in names:
        groups.setdefault(cache_family(n) or f"solo:{n}", []).append(n)

    def run_group(group: list[str]) -> list[tuple[str, object]]:
        out: list[tuple[str, object]] = []
        for n in group:
            try:
                out.append((n, check(n)))
            except BaseException as e:  # noqa: BLE001 — re-raised by caller
                out.append((n, e))
        return out

    results: dict[str, object] = {}
    with ThreadPoolExecutor(max_workers=threads) as ex:
        for chunk in ex.map(run_group, groups.values()):
            results.update(dict(chunk))
    return results
