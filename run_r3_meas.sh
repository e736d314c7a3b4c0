#!/bin/bash
# Round-3 follow-up measurements (run FIRST when the tunnel returns,
# while the chip is idle — before the 1.2 h checkerboard retrain):
#   1. A/B the encode-path compaction lowering on-chip:
#      HYRES_COMPACT=nonzero (jnp.nonzero serialized fusion, the round-3
#      profiled floor: 4x 5.15 ms/image) vs =merge (dense merge-tree).
#   2. Re-capture the profile breakdown + bench headline with the winner
#      (logs let us flip the code default with evidence).
# Chip stages run under scripts/chainstage.sh so the driver's bench.py
# can SIGSTOP them for an idle-chip measurement (bench.py invocations
# are NOT wrapped: bench pauses others, never itself).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
STAGE="bash scripts/chainstage.sh"

echo "=== gauss v2 on-chip exactness + pallas A/B ($(date))"
$STAGE timeout 2400 python scripts/pallas_ab.py 2>&1 | grep -v "^W\|external/" \
  | tee matched_r3/pallas_ab.log || true

echo "=== compact A/B microbench ($(date))"
for mode in nonzero merge; do
  echo "--- HYRES_COMPACT=$mode"
  HYRES_COMPACT=$mode $STAGE timeout 1200 python scripts/coder_microbench.py \
    2>&1 | grep -v "^W\|external/" || true
done 2>&1 | tee matched_r3/compact_ab.log

echo "=== gauss lane/lowering sweep ($(date))"
$STAGE timeout 3600 python scripts/coder_microbench.py --sweep \
  2>&1 | grep -v "^W\|external/" | tee matched_r3/lane_sweep.log || true

echo "=== profile breakdown with merge ($(date))"
HYRES_COMPACT=merge $STAGE timeout 2400 python scripts/profile_breakdown.py \
  > matched_r3/profile_breakdown_merge.txt 2>&1 || true
tail -20 matched_r3/profile_breakdown_merge.txt

echo "=== bench with merge ($(date))"
HYRES_COMPACT=merge timeout 2400 python bench.py \
  > matched_r3/bench_r3_merge.json 2> matched_r3/bench_r3_merge.log || true
cat matched_r3/bench_r3_merge.json

echo "=== bench with pallas decode ($(date))"
HYRES_GAUSS_IMPL=pallas timeout 2400 python bench.py \
  > matched_r3/bench_r3_pallas.json 2> matched_r3/bench_r3_pallas.log || true
cat matched_r3/bench_r3_pallas.json
echo "=== r3 measurements done ($(date))"
