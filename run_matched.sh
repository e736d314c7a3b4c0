#!/bin/bash
# Round 3: matched-budget family comparison (VERDICT r2 #5).
# All four families trained FROM SCRATCH at the same lambda and budget
# (1000 epochs, noise->STE at 400, disjoint split train=kodim01-18),
# then held-out eval with real bitstreams under both coders.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

COMMON="--jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --save-every 50 --min-lr 1e-6 \
  -e 1000 --noise-epochs 400 --lambda 0.013"

for fam in checkerboard cheng2020 hyres elic; do
  echo "=== training $fam ($(date))"
  python -m hyres_tpu.cli.training -d data/ds --model $fam \
    --savepath matched_r3/$fam $COMMON > matched_r3/$fam.log 2>&1
done
echo "=== matched sweep done ($(date))"
