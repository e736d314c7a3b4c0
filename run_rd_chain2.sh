#!/bin/bash
# Remaining lambda phases (0.004, 0.002) chained from the converged
# 0.008 checkpoint (LR-floor plateau by epoch ~200; 400 epochs each).
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
COMMON="--N 128 --M 192 --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --learning-rate 1e-4 --save-every 25 --min-lr 1e-6"
python -m hyres_tpu.cli.phase_runner -d data/ds \
  --lambdas 0.004 0.002 --epochs-per-phase 400 \
  --savepath phases_r2 --init-checkpoint phases_r2/phase1_0.008/checkpoint_last_200.msgpack \
  --passthrough $COMMON
echo "=== chain2 complete"
