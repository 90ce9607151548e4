#!/bin/bash
# Drive the full sf1 sweep: non-heavy in bulk sessions (restarting
# until none remain — the restart test is the recorded-results file,
# NOT the exit code: a timeout exit can surface as a JVM shutdown
# abort rather than the intended status 3), then each heavy oracle in
# its own subprocess with a long budget. Resumable via SF1_SWEEP.jsonl.
cd /root/repo
for attempt in 1 2 3 4 5 6 7 8; do
  left=$(python tools/sf1_sweep.py --count-missing-bulk 2>/dev/null | tail -1)
  [ -z "$left" ] || [ "$left" -eq 0 ] && break
  echo "bulk attempt $attempt: $left queries left"
  python tools/sf1_sweep.py
done
# cheapest expected ORACLE wall first, so a tight session budget
# verifies the most queries before hitting the quadratic stragglers
for name in corpus_pack_sequences dedup_winnow_pairs dedup_ngram_jaccard \
            dedup_allpairs_prefix corpus_incremental_dedup dedup_minhash_lsh \
            dedup_lsh_then_verify corpus_canonical_docs corpus_cluster_safe_split \
            corpus_dedup_components mm_frame_sample w1_lev_approx_scan \
            w1_flagship_occurrence_scan; do
  if grep -q "\"name\": \"$name\"" SF1_SWEEP.jsonl 2>/dev/null; then continue; fi
  SF1_SWEEP_BUDGET=2700 timeout 2760 python tools/sf1_sweep.py --one "$name"
  if ! grep -q "\"name\": \"$name\"" SF1_SWEEP.jsonl 2>/dev/null; then
    echo "{\"name\": \"$name\", \"status\": \"timeout\", \"wall\": 2760}" >> SF1_SWEEP.jsonl
  fi
done
echo SWEEP_DONE
