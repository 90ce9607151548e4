"""Render SF1_SWEEP.jsonl (tools/sf1_sweep.py output) into the
per-query markdown table for SF1.md and a machine-readable summary."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("SF1_SWEEP_OUT", "SF1_SWEEP.jsonl")


def main() -> None:
    from firefly_vcut_spark.plans import all_queries

    queries = all_queries()
    recs: dict[str, dict] = {}
    with open(OUT) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                recs[r["name"]] = r

    missing = [n for n in queries if n not in recs]
    by_status: dict[str, list] = {}
    for n in queries:
        r = recs.get(n)
        if r is None:
            continue
        by_status.setdefault(r["status"], []).append(r)

    print(f"recorded {len(recs)}/{len(queries)}; missing: {missing}")
    for st, rows in sorted(by_status.items()):
        print(f"  {st}: {len(rows)}")
    if "--md" not in sys.argv:
        return

    print()
    print("| status | n | queries (wall s) |")
    print("|---|---|---|")
    for st, rows in sorted(by_status.items()):
        if st == "pass":
            continue
        names = ", ".join(f"{r['name']} ({r['wall']})" for r in rows)
        print(f"| {st} | {len(rows)} | {names} |")
    passes = by_status.get("pass", [])
    oracle = [r for r in passes if r.get("kind") == "oracle"]
    rows_only = [r for r in passes if r.get("kind", "").startswith("rows-only")]
    walls = sorted(r["wall"] for r in passes)
    total = sum(walls)
    scale_only = ", ".join(
        f"{r['name']} ({r['wall']})"
        for r in passes
        if r.get("kind") == "rows-only-scale"
    )
    if scale_only:
        print(f"| rows-only-scale (oracle infeasible at sf1) | | {scale_only} |")
    print(
        f"| pass | {len(passes)} | {len(oracle)} oracle-hash, "
        f"{len(rows_only)} rows-only; total {total:.0f}s, "
        f"median {walls[len(walls) // 2]:.1f}s, "
        f"slowest: "
        + ", ".join(
            f"{r['name']} ({r['wall']})"
            for r in sorted(passes, key=lambda r: -r["wall"])[:6]
        )
        + " |"
    )


if __name__ == "__main__":
    main()
