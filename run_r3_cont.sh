#!/bin/bash
# Round-3 continuation (post-restart): the queued on-chip measurements,
# reordered so the headline bench (v2 segment-table coder, default
# dispatch = merge compaction + auto Pallas kernels) captures FIRST.
# No compile cache survived the restart; each stage seeds .jax_cache
# for the next.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
STAGE="bash scripts/chainstage.sh"

echo "=== bench v2 default dispatch ($(date))"
timeout 2400 python bench.py \
  > matched_r3/bench_r3_v2.json 2> matched_r3/bench_r3_v2.log || true
cat matched_r3/bench_r3_v2.json; tail -12 matched_r3/bench_r3_v2.log

echo "=== gauss v2 on-chip exactness + pallas A/B ($(date))"
$STAGE timeout 2400 python scripts/pallas_ab.py 2>&1 | grep -v "^W\|external/" \
  | tee matched_r3/pallas_ab.log || true

echo "=== profile breakdown (default dispatch) ($(date))"
$STAGE timeout 2400 python scripts/profile_breakdown.py \
  > matched_r3/profile_breakdown_v2.txt 2>&1 || true
tail -20 matched_r3/profile_breakdown_v2.txt

echo "=== compact A/B microbench ($(date))"
for mode in nonzero merge; do
  echo "--- HYRES_COMPACT=$mode"
  HYRES_COMPACT=$mode $STAGE timeout 1200 python scripts/coder_microbench.py \
    2>&1 | grep -v "^W\|external/" || true
done 2>&1 | tee matched_r3/compact_ab.log

echo "=== r3 continuation measurements done ($(date))"
