#!/bin/bash
# Held-out RD evaluation: run the inference CLI (real entropy-coded
# roundtrips, bpp from actual byte lengths) on data/ds/test (kodim19-24,
# disjoint from the training split) for every phase best checkpoint.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p rd_eval
for d in phases_r2/phaseA_0.032 phases_r2/phase0_0.016 phases_r2/phase1_0.008 \
         phases_r2/phase2_0.004 phases_r2/phase3_0.002; do
  [ -d "$d" ] || continue
  BEST=$(ls -1 $d/checkpoint_best_*.msgpack 2>/dev/null | sort | tail -1)
  [ -n "$BEST" ] || continue
  TAG=$(basename $d)
  echo "=== $TAG: $BEST"
  python -m hyres_tpu.cli.inference --checkpoint "$BEST" \
    --input data/ds/test --output rd_eval/$TAG --coder host
done
echo "=== RD eval complete"
