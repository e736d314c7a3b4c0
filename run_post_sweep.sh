#!/bin/bash
# Round 3: runs after run_matched.sh finishes — held-out eval of the
# matched-budget artifacts under both coders, then the wire/profile
# breakdown and a fresh bench, all on the then-free chip.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# wait for the sweep (run_matched.sh, pid passed as $1) to exit
while [ -e "/proc/$1" ]; do sleep 60; done
echo "=== sweep done, starting eval ($(date))"

bash run_matched_eval.sh
echo "=== eval done ($(date))"

python scripts/profile_breakdown.py --trace matched_r3/trace \
  > matched_r3/profile_breakdown.txt 2> matched_r3/profile_breakdown.log
echo "=== profile done ($(date))"

python bench.py > matched_r3/bench_r3.json 2> matched_r3/bench_r3.log
echo "=== bench done ($(date))"
