#!/bin/bash
# Wait for chain2, then refine-train on the lambda=0.004 best and run
# the held-out RD eval for all phases.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 $(cat /tmp/rd_chain2.pid) 2>/dev/null; do sleep 60; done
echo "=== chain2 finished; starting refine phase"
BEST=$(ls -1 phases_r2/phase0_0.004/checkpoint_best_*.msgpack 2>/dev/null | sort | tail -1)
if [ -n "$BEST" ]; then
  python -m hyres_tpu.cli.refine_training -d data/ds --checkpoint "$BEST" \
    --N 128 --M 192 --jpeg-quality 1 -e 300 --batch-size 4 \
    --patch-size 256 256 --savepath refine_r2
fi
echo "=== refine done; running held-out RD eval"
bash run_rd_eval.sh > /tmp/rd_eval.log 2>&1
echo "=== post-chain pipeline complete"
