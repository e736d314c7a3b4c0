#!/bin/bash
# Final measurement battery once the baseline pipeline finishes.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 $(cat /tmp/baselines.pid) 2>/dev/null; do sleep 60; done
echo "=== refine eval"
bash run_refine_eval.sh > /tmp/refine_eval.log 2>&1
echo "=== final bench"
timeout 2400 python bench.py > /tmp/bench_final.json 2>/tmp/bench_final.err
echo "=== final measurements complete"
