#!/bin/bash
# Held-out RD evaluation: run the inference CLI (real entropy-coded
# roundtrips, bpp from actual byte lengths) on data/ds/test (kodim19-24,
# disjoint from the training split) for every phase point.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p rd_eval
eval_one() {  # tag, checkpoint
  echo "=== $1: $2"
  python -m hyres_tpu.cli.inference --checkpoint "$2" \
    --input data/ds/test --output rd_eval/$1 --coder host
}
eval_one phaseA_0.032 "$(ls -1 phases_r2/phaseA_0.032/checkpoint_best_*.msgpack | tail -1)"
eval_one phase_0.016 "$(ls -1 phases_r2/phase0_0.016/checkpoint_best_*.msgpack | tail -1)"
# 0.008's rolling best predates the save-every retention fix; the
# LR-floor-converged last checkpoint is the better artifact
eval_one phase_0.008 phases_r2/phase1_0.008/checkpoint_last_200.msgpack
B4=$(ls -1 phases_r2/phase0_0.004/checkpoint_best_*.msgpack 2>/dev/null | tail -1)
[ -n "$B4" ] && eval_one phase_0.004 "$B4"
B2=$(ls -1 phases_r2/phase1_0.002/checkpoint_best_*.msgpack 2>/dev/null | tail -1)
[ -n "$B2" ] && eval_one phase_0.002 "$B2"
echo "=== RD eval complete"
