#!/bin/bash
# Absolute-RD push (round 3): the matched-budget rows are step-starved —
# 1000 "epochs" of an 18-image split is ~4.5k optimizer steps, ~1000x
# fewer than typical learned-codec recipes — and the round-3 JPEG-anchor
# measurement (scripts/jpeg_anchor.py) shows the resulting chain sits
# BELOW classical libjpeg on held-out data. Two levers that need no new
# data: dihedral crop augmentation (--augment) and shifting wall time
# from per-epoch eval back to training (--eval-every). Same lambda as
# the matched sweep so the delta is attributable.
# Runs unattended after run_cb_requeue.sh; no set -e.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== long HyRES train: lambda=0.013, augment, 6000 epochs ($(date))"
bash scripts/chainstage.sh timeout 16000 python -m hyres_tpu.cli.training \
    -d data/ds --model hyres \
    --savepath matched_r3/hyres_long \
    --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
    --patch-size 256 256 --alpha 0 --min-lr 1e-6 \
    -e 6000 --noise-epochs 2400 --lambda 0.013 \
    --augment --augment-scale 0.6 1.0 --eval-every 10 --save-every 50 \
    > matched_r3/hyres_long.log 2>&1 \
  || echo "!!! long train ended early ($(date)) — evaluating last checkpoint"

CKPT=$(ls -t matched_r3/hyres_long/checkpoint_best_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  for coder in host tpu; do
    echo "=== held-out eval ($coder) of $CKPT ($(date))"
    bash scripts/chainstage.sh timeout 3600 python -m hyres_tpu.cli.inference \
        --checkpoint "$CKPT" --model hyres --coder $coder \
        --N 128 --M 192 --jpeg-quality 1 \
        --input data/ds/test --output matched_r3/eval/hyres_long_$coder \
        > matched_r3/eval/hyres_long_$coder.log 2>&1 \
      || echo "!!! hyres_long $coder eval failed"
    tail -3 matched_r3/eval/hyres_long_$coder/metrics.csv 2>/dev/null
  done
else
  echo "!!! no hyres_long checkpoint produced"
fi
echo "=== long-train chain done ($(date))"
