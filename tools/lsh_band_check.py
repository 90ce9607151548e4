"""Empirical confirmation of the banding-tuning query at sf10 (r9,
verdict task 6): on the SAME deterministic 10% sf10 document sample
where the default 8×4 banding measured recall 0.743 (SCALING.md
§sf10), (1) run dedup_lsh_band_tuning's sweep over the sample's truth
pairs and report the chosen banding, (2) run the actual MinHash-LSH
blocking with the default AND the chosen banding and report measured
recall for both — the check that the S-curve-chosen parameters
recover ≥0.9 where 8×4 did not.

Usage: python tools/lsh_band_check.py [sf_dir] [mod]
       (default .localdata/sf10, doc_id % 10 = 0)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from firefly_vcut_spark.operators.dedup import minhash_lsh_candidates
    from firefly_vcut_spark.plans.affinity_sql import allpairs_verified_pairs
    from firefly_vcut_spark.plans.lsh_tuning_sql import (
        CANDIDATE_BANDINGS,
        TARGET_RECALL_PPM,
        _PPM,
        _detect_ppm_expr,
        detect_ppm_py,
        _FP_REF_J_PPM,
    )
    from firefly_vcut_spark.session import get_spark
    from firefly_vcut_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("lsh-band-check")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % mod == 0)
        .select("doc_id", "text")
    )

    t0 = time.time()
    truth = allpairs_verified_pairs(docs).select(
        "id_a", "id_b", F.expr(f"(ix * {_PPM}) DIV (sza + szb - ix)").alias("j_ppm")
    )
    truth.cache()
    n_truth = truth.count()
    t_truth = round(time.time() - t0, 1)
    print(f"truth pairs: {n_truth} ({t_truth}s)", flush=True)

    # sweep on the sampled distribution (same math as the registry query)
    sums = truth.agg(
        *[
            F.expr(f"sum({_detect_ppm_expr('j_ppm', b, r, 'DIV')})")
            .cast("long")
            .alias(f"s_{b}_{r}")
            for b, r in CANDIDATE_BANDINGS
        ]
    ).first()
    sweep = sorted(
        (
            {
                "bands": b,
                "rows": r,
                "exp_recall_ppm": sums[f"s_{b}_{r}"] // n_truth,
                "fp_at_j03_ppm": detect_ppm_py(_FP_REF_J_PPM, b, r),
            }
            for b, r in CANDIDATE_BANDINGS
        ),
        key=lambda c: (
            -(c["exp_recall_ppm"] >= TARGET_RECALL_PPM),
            c["fp_at_j03_ppm"],
            c["bands"] * c["rows"],
            c["bands"],
        ),
    )
    chosen = sweep[0]
    print("sweep:", json.dumps(sweep), flush=True)

    out = {"sf_dir": sf_dir, "mod": mod, "n_truth": n_truth, "sweep": sweep}
    for tag, (b, r) in {
        "default_8x4": (8, 4),
        f"chosen_{chosen['bands']}x{chosen['rows']}": (
            chosen["bands"],
            chosen["rows"],
        ),
    }.items():
        t0 = time.time()
        cand = minhash_lsh_candidates(
            docs, num_hashes=b * r, bands=b, hash_mode="portable"
        ).select("id_a", "id_b")
        found = truth.join(cand, ["id_a", "id_b"], "left_semi").count()
        out[tag] = {
            "bands": b,
            "rows": r,
            "found": found,
            "recall": round(found / max(n_truth, 1), 4),
            "wall": round(time.time() - t0, 1),
        }
        print(tag, out[tag], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
