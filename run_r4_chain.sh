#!/bin/bash
# Round-4 unattended measurement + training chain. Order = VERDICT r3
# priority: (1) a valid on-chip bench capture under the v2 coder,
# (2) kernel-vs-XLA A/B evidence on the real backend, (3) the lost
# checkerboard matched-budget row, (4) the long-train RD push.
# NO set -e: stages are independent; later stages must survive earlier
# failures. Every JSON artifact is checked non-empty before the chain
# declares the stage done (ADVICE r3: a 0-byte bench_r3_v2.json was
# committed as if it were a result).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
mkdir -p matched_r4/eval

json_ok () { # json_ok FILE — non-empty AND last line parses with "value"
  [ -s "$1" ] && python - "$1" <<'EOF'
import json, sys
line = open(sys.argv[1]).read().strip().splitlines()[-1]
rec = json.loads(line)
assert "value" in rec
EOF
}

# -- stage 1: bench warm + fresh capture -----------------------------------
echo "=== bench warm+capture ($(date))"
bash scripts/chainstage.sh bash scripts/bench_warm.sh \
  > matched_r4/bench_warm.log 2>&1 \
  || echo "!!! bench warm rc!=0 ($(date))"
# the warm run IS a full bench; keep its JSON if valid
grep -h '"value"' /tmp/bench_warm.out 2>/dev/null | tail -1 \
  > matched_r4/bench_r4.json
if json_ok matched_r4/bench_r4.json; then
  echo "=== bench_r4.json captured: $(cat matched_r4/bench_r4.json)"
  cp /tmp/bench_warm.out matched_r4/bench_r4.log 2>/dev/null
else
  echo "!!! bench warm produced no valid JSON — rerunning bench directly"
  rm -f matched_r4/bench_r4.json
  bash scripts/chainstage.sh timeout 2400 \
    env HYRES_BENCH_DEADLINE_S=1800 HYRES_BENCH_TOTAL_S=2200 \
    python bench.py > matched_r4/bench_r4.json 2> matched_r4/bench_r4.log
  json_ok matched_r4/bench_r4.json \
    || { echo "!!! bench capture STILL invalid"; rm -f matched_r4/bench_r4.json; }
fi

# -- stage 2: kernel-vs-XLA A/B on the real backend -------------------------
echo "=== pallas kernel A/B ($(date))"
bash scripts/chainstage.sh timeout 2400 python scripts/pallas_ab.py \
  > matched_r4/pallas_ab.log 2>&1 \
  || echo "!!! pallas_ab failed ($(date))"
tail -5 matched_r4/pallas_ab.log

# -- stage 3: checkerboard matched-budget retrain (lost in r3 cleanup) ------
echo "=== checkerboard matched retrain ($(date))"
COMMON="--jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
  --patch-size 256 256 --alpha 0 --save-every 50 --min-lr 1e-6 \
  -e 1000 --noise-epochs 400 --lambda 0.013"
bash scripts/chainstage.sh timeout 14400 python -m hyres_tpu.cli.training \
    -d data/ds --model checkerboard \
    --savepath matched_r4/checkerboard $COMMON \
    > matched_r4/checkerboard.log 2>&1 \
  || echo "!!! checkerboard retrain ended early ($(date))"

# -- stage 4: held-out eval of the retrained checkerboard (both coders) -----
CKPT=$(ls -t matched_r4/checkerboard/checkpoint_best_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  for coder in host tpu; do
    echo "=== checkerboard eval ($coder) of $CKPT ($(date))"
    bash scripts/chainstage.sh timeout 3600 python -m hyres_tpu.cli.inference \
        --checkpoint "$CKPT" --model checkerboard --coder $coder --N 128 \
        --input data/ds/test --output matched_r4/eval/checkerboard_$coder \
        > matched_r4/eval/checkerboard_$coder.log 2>&1 \
      || echo "!!! checkerboard $coder eval failed"
    tail -3 matched_r4/eval/checkerboard_$coder/metrics.csv 2>/dev/null
  done
else
  echo "!!! no checkerboard checkpoint produced"
fi

# -- stage 5: long-train RD push (runs until the round ends; checkpoints
#    every 50 epochs, so partial progress still evaluates) ------------------
echo "=== long HyRES train ($(date))"
bash scripts/chainstage.sh timeout 16000 python -m hyres_tpu.cli.training \
    -d data/ds --model hyres \
    --savepath matched_r4/hyres_long \
    --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
    --patch-size 256 256 --alpha 0 --min-lr 1e-6 \
    -e 6000 --noise-epochs 2400 --lambda 0.013 \
    --augment --augment-scale 0.6 1.0 --eval-every 10 --save-every 50 \
    > matched_r4/hyres_long.log 2>&1 \
  || echo "!!! long train ended early ($(date)) — evaluating last checkpoint"

CKPT=$(ls -t matched_r4/hyres_long/checkpoint_best_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  for coder in host tpu; do
    echo "=== hyres_long eval ($coder) of $CKPT ($(date))"
    bash scripts/chainstage.sh timeout 3600 python -m hyres_tpu.cli.inference \
        --checkpoint "$CKPT" --model hyres --coder $coder \
        --N 128 --M 192 --jpeg-quality 1 \
        --input data/ds/test --output matched_r4/eval/hyres_long_$coder \
        > matched_r4/eval/hyres_long_$coder.log 2>&1 \
      || echo "!!! hyres_long $coder eval failed"
    tail -3 matched_r4/eval/hyres_long_$coder/metrics.csv 2>/dev/null
  done
fi
echo "=== r4 chain done ($(date))"
