#!/bin/bash
# After the post-chain pipeline: short standalone trainings of the two
# baseline families on the disjoint split, artifacts saved for timing +
# RD rows, then held-out eval of each with both coders.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 $(cat /tmp/post_chain.pid) 2>/dev/null; do sleep 60; done
echo "=== post-chain done; training baseline families"

COMMON="--jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --save-every 25 --min-lr 1e-6"

python -m hyres_tpu.cli.training -d data/ds --model elic --lambda 0.013 \
  -e 250 --noise-epochs 120 --savepath baselines_r2/elic $COMMON
python -m hyres_tpu.cli.training -d data/ds --model cheng2020 --lambda 0.013 \
  -e 250 --noise-epochs 120 --savepath baselines_r2/cheng $COMMON
python -m hyres_tpu.cli.training -d data/ds --model checkerboard --lambda 0.013 \
  -e 250 --noise-epochs 120 --savepath baselines_r2/checkerboard $COMMON

for fam in elic cheng checkerboard; do
  BEST=$(ls -1 baselines_r2/$fam/checkpoint_best_*.msgpack 2>/dev/null | sort | tail -1)
  [ -n "$BEST" ] || continue
  name=$fam
  [ "$fam" = cheng ] && name=cheng2020
  for coder in host tpu; do
    python -m hyres_tpu.cli.inference --checkpoint "$BEST" --model $name \
      --input data/ds/test --output rd_eval/${fam}_$coder --coder $coder
  done
done
echo "=== baselines complete"
