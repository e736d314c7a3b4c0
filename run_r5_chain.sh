#!/bin/bash
# Round-5 unattended measurement + training chain. Order = VERDICT r4
# priority: (3) finish the found-data RD experiment budget-realistically
# (train sized to the measured ~1.4 s/epoch so the STE phase AND both
# held-out evals fit), (5) timing-trustworthy eval CSVs, (2) a FRESH
# bench capture as the LAST stage (the r4 failure mode was kernel
# commits after the last cache warm — the chain now always re-warms and
# re-captures at the end, after every code-touching stage).
# NO set -e: stages are independent. json_ok rejects CACHED records
# (ADVICE r4: a cached emission must never be saved as a fresh capture).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
mkdir -p matched_r5/eval

json_ok () { # non-empty AND last line parses with "value" AND not CACHED
  [ -s "$1" ] && python - "$1" <<'EOF'
import json, sys
line = open(sys.argv[1]).read().strip().splitlines()[-1]
rec = json.loads(line)
assert "value" in rec
assert "[CACHED" not in rec.get("unit", "")
EOF
}

# -- stage 0: rebuild the data splits (fresh checkout has no data/) ---------
if [ ! -d data/ds/train ]; then
  echo "=== rebuilding data splits ($(date))"
  mkdir -p data/ds/train data/ds/test
  for i in $(seq -w 1 18); do
    cp /root/reference/data/test/kodim0$i.png data/ds/train/ 2>/dev/null \
      || cp /root/reference/data/test/kodim$i.png data/ds/train/
  done
  for i in 19 20 21 22 23 24; do
    cp /root/reference/data/test/kodim$i.png data/ds/test/
  done
fi
echo "ds train: $(ls data/ds/train | wc -l), test: $(ls data/ds/test | wc -l)"
python scripts/found_data.py || echo "!!! found_data failed; continuing"
mkdir -p data/mix/train data/mix/test
for f in data/ds/train/*.png data/found/train/*.png; do
  [ -e "$f" ] && ln -sf "../../../$f" "data/mix/train/$(basename "$f")"
done
for f in data/ds/test/*.png; do
  ln -sf "../../../$f" "data/mix/test/$(basename "$f")"
done
echo "mix train: $(ls data/mix/train | wc -l)"

# -- stage 1: found-data train, budget-sized (VERDICT r4 #3) ----------------
# 2000 epochs, noise->STE at 800 (reference-proportional 40%,
# src/training.py:241); ~1.4 s/epoch measured in r4 => ~2900 s. The
# timeout is a hard stop ABOVE the plan (r4's failure: the plan itself
# exceeded the budget and died mid-noise-phase with evals unrun).
echo "=== stage 1: found-data train ($(date))"
bash scripts/chainstage.sh timeout 4700 python -m hyres_tpu.cli.training \
    -d data/mix --model hyres \
    --savepath matched_r5/hyres_found \
    --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
    --patch-size 256 256 --alpha 0 --min-lr 1e-6 \
    -e 2000 --noise-epochs 800 --lambda 0.013 \
    --augment --augment-scale 0.5 1.0 --eval-every 10 --save-every 50 \
    > matched_r5/hyres_found.log 2>&1 \
  || echo "!!! train stage ended by timeout ($(date)) — evaluating best ckpt"

CKPT=$(ls -t matched_r5/hyres_found/checkpoint_best_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  for coder in tpu host; do
    echo "=== stage 2: hyres_found eval ($coder) of $CKPT ($(date))"
    bash scripts/chainstage.sh timeout 1800 python -m hyres_tpu.cli.inference \
        --checkpoint "$CKPT" --model hyres --coder $coder \
        --N 128 --M 192 --jpeg-quality 1 \
        --input data/ds/test --output matched_r5/eval/hyres_found_$coder \
        > matched_r5/eval/hyres_found_$coder.log 2>&1 \
      || echo "!!! hyres_found $coder eval failed"
    tail -3 matched_r5/eval/hyres_found_$coder/metrics.csv 2>/dev/null
  done
  echo "=== stage 2b: jpeg equal-rate comparison ($(date))"
  timeout 900 python scripts/equal_rate_vs_jpeg.py \
    --metrics matched_r5/eval/hyres_found_tpu/metrics.csv \
    --images data/ds/test > matched_r5/hyres_found_vs_jpeg.txt 2>&1 \
    || echo "!!! equal-rate comparison failed"
  cat matched_r5/hyres_found_vs_jpeg.txt 2>/dev/null | tail -8
else
  echo "!!! no hyres_found checkpoint produced"
fi

# -- stage 3: timing-trustworthy eval CSVs for the committed artifacts ------
# (VERDICT r4 #5: the r4 CSVs carried compile-contaminated averages; the
# r4 checkpoints are gone, so the repaired schema is demonstrated on the
# committed artifacts + the fresh found-data model, all with the
# median/outlier-robust _write_csv.)
echo "=== stage 3: artifact eval CSVs ($(date))"
bash scripts/chainstage.sh timeout 1800 python -m hyres_tpu.cli.inference \
    --checkpoint artifacts/hyres_n128_q1_l0032.msgpack --model hyres \
    --coder tpu --N 128 --M 192 --jpeg-quality 1 \
    --input data/ds/test --output matched_r5/eval/hyres_l0032_tpu \
    > matched_r5/eval/hyres_l0032_tpu.log 2>&1 \
  || echo "!!! hyres artifact eval failed"
tail -3 matched_r5/eval/hyres_l0032_tpu/metrics.csv 2>/dev/null
bash scripts/chainstage.sh timeout 1800 python -m hyres_tpu.cli.inference \
    --checkpoint artifacts/checkerboard_n128_l0013.msgpack --model checkerboard \
    --coder tpu --N 128 \
    --input data/ds/test --output matched_r5/eval/checkerboard_l0013_tpu \
    > matched_r5/eval/checkerboard_l0013_tpu.log 2>&1 \
  || echo "!!! checkerboard artifact eval failed"
tail -3 matched_r5/eval/checkerboard_l0013_tpu/metrics.csv 2>/dev/null

# -- stage 4 (ALWAYS LAST): bench warm + FRESH capture ----------------------
echo "=== stage 4: bench warm + fresh capture ($(date))"
bash scripts/chainstage.sh bash scripts/bench_warm.sh \
  > matched_r5/bench_warm.log 2>&1 \
  || echo "!!! bench warm rc!=0 ($(date))"
grep -h '"value"' /tmp/bench_warm.out 2>/dev/null | tail -1 \
  > matched_r5/bench_r5.json
if json_ok matched_r5/bench_r5.json; then
  echo "=== bench_r5.json captured: $(cat matched_r5/bench_r5.json)"
  cp /tmp/bench_warm.out matched_r5/bench_r5.log 2>/dev/null
else
  echo "!!! bench warm produced no valid fresh JSON — rerunning bench directly"
  rm -f matched_r5/bench_r5.json
  bash scripts/chainstage.sh timeout 2400 \
    env HYRES_BENCH_DEADLINE_S=1800 HYRES_BENCH_TOTAL_S=2200 \
    python bench.py > matched_r5/bench_r5.json 2> matched_r5/bench_r5.log
  json_ok matched_r5/bench_r5.json \
    || { echo "!!! bench capture STILL not fresh"; }
fi
echo "=== r5 chain done ($(date))"
