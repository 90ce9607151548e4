"""Intermediate-vacuity audit: run every registry query and flag PLAN
OPERATORS that produced ZERO rows — the class the r9 judge caught at
the output level (`agg_incremental_join_mv` hashing ∅ = ∅ for two
rounds) and the r10 non-empty gate now blocks for query OUTPUTS. This
tool goes one level deeper: a query can return rows while one of its
join inputs, union branches, or filter legs is empty at every tested
scale — meaning that code path has never actually been exercised by
the oracle (outer joins and unions mask it).

Method: execute each query (collect on the SAME queryExecution so the
SQL metrics populate; AQE off so the executed tree is the static
plan), walk the physical operator tree, and report every node whose
`numOutputRows` metric is 0 — excluding nodes downstream of a
zero-row ancestor (one empty scan cascades; only the ROOT CAUSE node
is interesting).

Zero-output operators are not automatically bugs — an anti-join that
prunes everything, a validity filter on all-valid fixture data, or an
empty error-path union leg can be intentional. The audit is a REVIEW
REPORT, not a gate: run it when fixtures or predicates change, and
either fix the predicate (as r10 did for P10's impossible mod-200
block) or record why the empty leg is intended.

Usage: python tools/vacuity_audit.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# plan nodes whose zero-output is structural bookkeeping, not a data
# path. Matched by PREFIX: Spark names codegen nodes
# "WholeStageCodegen (N)", so exact matching could silently stop
# covering them if a Spark version adds numOutputRows there (r10
# ADVICE finding — today those nodes carry no such metric, but the
# guard should not depend on that).
_IGNORE = ("InputAdapter", "ColumnarToRow", "WholeStageCodegen")


def zero_nodes(plan) -> list[str]:
    """Names of zero-output operators, pruned below the first zero
    (children of an empty node are vacuously empty — report the root
    cause only). Node names carry a child index path for locating the
    leg inside the tree."""
    out: list[str] = []

    def walk(node, path: str) -> None:
        name = node.nodeName().strip()
        m = node.metrics()
        if m.contains("numOutputRows") and not name.startswith(_IGNORE):
            if m.apply("numOutputRows").value() == 0:
                out.append(f"{path}{name}")
                return  # downstream of this node is vacuously empty
        for i in range(node.children().size()):
            walk(node.children().apply(i), f"{path}{name}[{i}]/")

    walk(plan, "")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from firefly_vcut_spark.plans import all_queries
    from firefly_vcut_spark.session import get_spark

    spark = get_spark("vacuity-audit")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = all_queries()
    report: dict[str, dict] = {}
    flagged = 0
    for name, q in qs.items():
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            n = len(df.collect())
            zeros = zero_nodes(df._jdf.queryExecution().executedPlan())
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": repr(e)[:200]}
            flagged += 1
            print(f"{name}: ERROR {repr(e)[:120]}", flush=True)
            continue
        if zeros:
            report[name] = {"rows": n, "zero_output_ops": zeros}
            flagged += 1
            print(
                f"{name}: {n} rows, {len(zeros)} zero-output op(s) "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
            for z in zeros:
                print(f"    {z}")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    json.dump(report, open("/tmp/vacuity_audit.json", "w"), indent=1)
    print(f"\n{flagged}/{len(qs)} queries with zero-output operators "
          f"(details: /tmp/vacuity_audit.json)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
