#!/bin/bash
# Round-5 recovery chain: everything that still needs the chip, in
# priority order, for whenever the wedged axon backend returns.
# Stage budgets assume ~2.5 h of chip time; each stage is independent
# (no set -e) and the fresh bench runs LAST so it sees every landed
# change (including the column-sparse coefficient pack).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
mkdir -p matched_r5/eval

json_ok () {
  [ -s "$1" ] && python - "$1" <<'EOF'
import json, sys
line = open(sys.argv[1]).read().strip().splitlines()[-1]
rec = json.loads(line)
assert "value" in rec
assert "[CACHED" not in rec.get("unit", "")
EOF
}

# -- stage 0: on-chip verify of the column-sparse coef pack ------------
echo "=== stage 0: on-chip verify ($(date))"
timeout 1200 python scripts/verify_drive.py > matched_r5/verify_colpack.log 2>&1 \
  && grep -q "VERIFY OK" matched_r5/verify_colpack.log \
  || { echo "!!! on-chip verify FAILED — see matched_r5/verify_colpack.log"; }
tail -4 matched_r5/verify_colpack.log

# -- stage 1: fresh dispatch probe (the committed log refresh) ---------
echo "=== stage 1: enc dispatch probe ($(date))"
timeout 900 python scripts/enc_dispatch_probe.py auto \
  > matched_r5/enc_dispatch_probe_postfix.log 2>&1 \
  || echo "!!! dispatch probe failed"
tail -6 matched_r5/enc_dispatch_probe_postfix.log

# -- stage 2: resume found-data train to the matched-budget protocol ---
CKPT_LAST=$(ls -t matched_r5/hyres_found/checkpoint_last_*.msgpack 2>/dev/null | head -1)
echo "=== stage 2: resume found-data train from $CKPT_LAST ($(date))"
bash scripts/chainstage.sh timeout 2400 python -m hyres_tpu.cli.training \
    -d data/mix --model hyres \
    --savepath matched_r5/hyres_found \
    --checkpoint "$CKPT_LAST" \
    --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
    --patch-size 256 256 --alpha 0 --min-lr 1e-6 \
    -e 1000 --noise-epochs 400 --lambda 0.013 \
    --augment --augment-scale 0.5 1.0 --eval-every 10 --save-every 50 \
    >> matched_r5/hyres_found.log 2>&1 \
  || echo "!!! train resume ended by timeout ($(date))"

CKPT=$(ls -t matched_r5/hyres_found/checkpoint_best_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  for coder in tpu host; do
    echo "=== stage 3: hyres_found eval ($coder) of $CKPT ($(date))"
    bash scripts/chainstage.sh timeout 1500 python -m hyres_tpu.cli.inference \
        --checkpoint "$CKPT" --model hyres --coder $coder \
        --N 128 --M 192 --jpeg-quality 1 \
        --input data/ds/test --output matched_r5/eval/hyres_found_$coder \
        > matched_r5/eval/hyres_found_$coder.log 2>&1 \
      || echo "!!! hyres_found $coder eval failed"
    tail -3 matched_r5/eval/hyres_found_$coder/metrics.csv 2>/dev/null
  done
  echo "=== stage 3b: jpeg equal-rate comparison ($(date))"
  timeout 900 python scripts/equal_rate_vs_jpeg.py \
    --metrics matched_r5/eval/hyres_found_tpu/metrics.csv \
    --images data/ds/test > matched_r5/hyres_found_vs_jpeg.txt 2>&1 \
    || echo "!!! equal-rate comparison failed"
  tail -8 matched_r5/hyres_found_vs_jpeg.txt 2>/dev/null
fi

# -- stage 4: timing-trustworthy artifact eval CSV ---------------------
echo "=== stage 4: artifact eval CSV ($(date))"
bash scripts/chainstage.sh timeout 1200 python -m hyres_tpu.cli.inference \
    --checkpoint artifacts/hyres_n128_q1_l0032.msgpack --model hyres \
    --coder tpu --N 128 --M 192 --jpeg-quality 1 \
    --input data/ds/test --output matched_r5/eval/hyres_l0032_tpu \
    > matched_r5/eval/hyres_l0032_tpu.log 2>&1 \
  || echo "!!! hyres artifact eval failed"
tail -3 matched_r5/eval/hyres_l0032_tpu/metrics.csv 2>/dev/null

# -- stage 5 (ALWAYS LAST): fresh bench --------------------------------
echo "=== stage 5: fresh bench ($(date))"
bash scripts/chainstage.sh timeout 1700 \
  env HYRES_BENCH_DEADLINE_S=900 HYRES_BENCH_TOTAL_S=1500 \
  python bench.py > matched_r5/bench_r5.json 2> matched_r5/bench_r5.log
json_ok matched_r5/bench_r5.json \
  && echo "=== bench_r5.json: $(cat matched_r5/bench_r5.json)" \
  || echo "!!! bench capture not fresh/valid"
echo "=== r5 recovery done ($(date))"
