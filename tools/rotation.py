"""Driver-window rotation helper (r8): list registry queries that have
NEVER appeared in a driver-recorded CORRECTNESS_r*.json, grouped by the
family buckets the first-50 coverage gate uses — the input for next
round's `registry._FRONT50` rotation.

Usage: python tools/rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def family(name: str) -> str:
    # mirror of tests/test_oracle.py::_family
    if name.startswith("t_"):
        return "temporal_join"
    if name.startswith("p_queue"):
        return "p"
    if name.startswith("w_"):
        return "stream_window"
    if name.startswith(("w1", "w2")):
        return name[:2]
    for fam in ("corpus", "dedup", "ann", "text", "mm", "agg", "win", "st", "set", "fjson"):
        if name.startswith(fam + "_"):
            return fam
    return name.split("_")[0].rstrip("0123456789")


def main() -> None:
    from firefly_vcut_spark.plans import all_queries

    ever: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        ever.update(json.load(open(f)))
    qs = list(all_queries())
    never = [n for n in qs if n not in ever]
    by_fam: dict[str, list[str]] = {}
    for n in never:
        by_fam.setdefault(family(n), []).append(n)
    print(f"# {len(never)} never-recorded of {len(qs)} (driver files: "
          f"{len(glob.glob('CORRECTNESS_r*.json'))})")
    for fam in sorted(by_fam):
        print(f"\n## {fam} ({len(by_fam[fam])})")
        for n in by_fam[fam]:
            print(f"  {n}")
    anchors = sorted(
        {family(n) for n in qs} - {family(n) for n in never}
    )
    print(f"\n# families with zero never-recorded members (need fixed "
          f"anchors): {anchors}")


if __name__ == "__main__":
    main()
