#!/bin/bash
# Round-4 post-chain sequence: wait for run_r4_chain.sh to finish, then
# (1) re-run the kernel A/B under the pltpu.roll rewrite + realistic-rate
#     planes (the first capture crashed on synthetic-rate overflow),
# (2) refresh the profile breakdown under the v2 coder + kernels,
# (3) hand the chip to the stage-5 found-data RD push with the budget
#     passed as $2 (default 9600 s).
# No set -e: stages are independent.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
CHAIN_PID=${1:?usage: run_r4_post.sh CHAIN_PID [STAGE5_BUDGET_S]}
BUDGET_S=${2:-9600}

while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 20; done
echo "=== chain done; post sequence starting ($(date))"

echo "=== pallas A/B rerun (roll rewrite, trained-rate planes) ($(date))"
bash scripts/chainstage.sh timeout 2400 python scripts/pallas_ab.py \
  > matched_r4/pallas_ab2.log 2>&1 \
  || echo "!!! pallas_ab2 failed ($(date))"
grep -v WARNING matched_r4/pallas_ab2.log | tail -12

echo "=== profile breakdown refresh (v2 coder + kernels) ($(date))"
bash scripts/chainstage.sh timeout 1800 python scripts/profile_breakdown.py \
  > matched_r4/profile_breakdown_r4.txt 2>&1 \
  || echo "!!! profile refresh failed ($(date))"
tail -25 matched_r4/profile_breakdown_r4.txt

echo "=== stage 5: found-data RD push (budget ${BUDGET_S}s) ($(date))"
bash run_r4_stage5.sh "$BUDGET_S"
echo "=== r4 post sequence done ($(date))"
