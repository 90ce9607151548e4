"""Run the driver's correctness gate locally: first-50 registry window
vs DuckDB oracle at sf0.01. Mirrors what CORRECTNESS_r{N}.json records."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firefly_vcut_spark.oracle import compare
from firefly_vcut_spark.plans import all_queries
from firefly_vcut_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("front50-check")
    qs = all_queries()
    bad = 0
    out = {}
    for name in list(qs)[:50]:
        q = qs[name]
        t0 = time.time()
        try:
            if q.sql is None:
                n = q.fn(spark, sf_dir).count()
                out[name] = {"rows_only": True, "rows": n, "ok": n >= 0}
            else:
                res = compare(name, spark, sf_dir, q.fn, q.sql)
                out[name] = {"ok": res.ok, "detail": None if res.ok else res.detail}
                if not res.ok:
                    bad += 1
        except Exception as e:  # noqa: BLE001
            out[name] = {"ok": False, "detail": repr(e)[:300]}
            bad += 1
        print(f"{name}: {'OK' if out[name]['ok'] else 'FAIL'} ({time.time()-t0:.1f}s)", flush=True)
    json.dump(out, open("/tmp/front50_check.json", "w"), indent=1)
    print(f"\n{50 - bad}/50 green")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
