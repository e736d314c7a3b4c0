#!/bin/bash
# Round 3 follow-up: checkerboard's matched-budget checkpoints were lost
# to a gitignore cleanup after its 1000-epoch run finished (the other
# three families' survived). Retrain it with the IDENTICAL recipe from
# run_matched.sh, then re-run the full held-out eval for ALL families
# under both coders with the warm-timing CLI (geometric buckets + full
# warm-up), so every metrics.csv row is a warm-model measurement.
# NO set -e: this chain runs unattended behind the tunnel waiter; a
# failure in any stage must not cost the later (independent) stages.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

COMMON="--jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --save-every 50 --min-lr 1e-6 \
  -e 1000 --noise-epochs 400 --lambda 0.013"

bash run_r3_meas.sh 2>&1 | tee matched_r3/r3_meas.log \
  || echo "!!! run_r3_meas failed ($(date))"

echo "=== retraining checkerboard ($(date))"
if bash scripts/chainstage.sh timeout 14400 python -m hyres_tpu.cli.training \
    -d data/ds --model checkerboard \
    --savepath matched_r3/checkerboard $COMMON \
    > matched_r3/checkerboard.log 2>&1; then
  echo "=== checkerboard done ($(date))"
else
  echo "!!! checkerboard retrain failed ($(date)) — evaluating the other families anyway"
fi

bash run_matched_eval.sh || echo "!!! matched eval failed ($(date))"

bash run_longtrain.sh || echo "!!! longtrain chain failed ($(date))"
echo "=== all done ($(date))"
