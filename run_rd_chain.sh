#!/bin/bash
# Round-2 honest-protocol RD chain: disjoint Kodak split
# (train = kodim01-18, held-out test = kodim19-24).
# Fresh lambda=0.032 phase, then chained phases via cli.phase_runner.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

COMMON="--N 128 --M 192 --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --learning-rate 1e-4 --save-every 25"

python -m hyres_tpu.cli.training -d data/ds --lambda 0.032 -e 1200 \
  --noise-epochs 600 --savepath phases_r2/phase_fresh_0.032 $COMMON

BEST=$(ls -1 phases_r2/phase_fresh_0.032/checkpoint_best_*.msgpack | sort | tail -1)
echo "=== fresh phase done, chaining from $BEST"

python -m hyres_tpu.cli.phase_runner -d data/ds \
  --lambdas 0.016 0.008 0.004 0.002 --epochs-per-phase 600 \
  --savepath phases_r2 --init-checkpoint "$BEST" \
  --passthrough $COMMON --noise-epochs 300

echo "=== RD chain complete"
