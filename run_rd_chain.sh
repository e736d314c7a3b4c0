#!/bin/bash
# Round-2 honest-protocol RD chain: disjoint Kodak split
# (train = kodim01-18, held-out test = kodim19-24).
# Phase A: short retune of lambda=0.032 from the quantile-repaired fresh
# checkpoint (the fresh phase ran with the optax.masked optimizer bug;
# quantiles were refit closed-form, transforms retune briefly here).
# Phase B: chain lambda 0.016/0.008/0.004/0.002 via cli.phase_runner.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

COMMON="--N 128 --M 192 --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --learning-rate 1e-4 --save-every 25 --min-lr 1e-6"

python -m hyres_tpu.cli.training -d data/ds --lambda 0.032 -e 250 \
  --pretrained --checkpoint phases_r2/phase_fresh_0.032/checkpoint_repaired.msgpack \
  --savepath phases_r2/phaseA_0.032 $COMMON

BEST=$(ls -1 phases_r2/phaseA_0.032/checkpoint_best_*.msgpack | sort | tail -1)
echo "=== 0.032 retune done, chaining from $BEST"

python -m hyres_tpu.cli.phase_runner -d data/ds \
  --lambdas 0.016 0.008 0.004 0.002 --epochs-per-phase 600 \
  --savepath phases_r2 --init-checkpoint "$BEST" \
  --passthrough $COMMON

echo "=== RD chain complete"
