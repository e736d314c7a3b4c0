#!/bin/bash
# Round-4 stage 5 (replaces run_r4_chain.sh's final stage): the
# absolute-RD push with the two levers this environment allows —
# (1) FOUND DATA: scripts/found_data.py curates natural-statistics
#     images bundled in installed packages (~23 MP, ~58 kodim-
#     equivalents), mixed with the disjoint Kodak train split;
# (2) augmentation (dihedral + random rescale) and eval-every-10.
# Budget-sized: BUDGET_S (arg 1, default 5400) caps the training stage
# so eval + comparison always run inside the round.  No set -e.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
BUDGET_S=${1:-5400}
mkdir -p matched_r4/eval

echo "=== stage 5: found-data long train (budget ${BUDGET_S}s, $(date))"
python scripts/found_data.py || echo "!!! found_data failed; continuing with Kodak-only"
mkdir -p data/mix/train data/mix/test
for f in data/ds/train/*.png data/found/train/*.png; do
  [ -e "$f" ] && ln -sf "../../../$f" "data/mix/train/$(basename "$f")"
done
for f in data/ds/test/*.png; do
  ln -sf "../../../$f" "data/mix/test/$(basename "$f")"
done
echo "train images: $(ls data/mix/train | wc -l), test: $(ls data/mix/test | wc -l)"

# ~12 steps/epoch at batch 4 over 46 images; epochs capped by wall budget
# via timeout (checkpoints every 50 epochs keep partial progress usable).
# noise->STE switch at 40% of the plan, reference-proportional
# (src/training.py:241 switches at 400/4000).
bash scripts/chainstage.sh timeout "$BUDGET_S" python -m hyres_tpu.cli.training \
    -d data/mix --model hyres \
    --savepath matched_r4/hyres_found \
    --jpeg-quality 1 --batch-size 4 --test-batch-size 4 \
    --patch-size 256 256 --alpha 0 --min-lr 1e-6 \
    -e 4000 --noise-epochs 1600 --lambda 0.013 \
    --augment --augment-scale 0.5 1.0 --eval-every 10 --save-every 50 \
    > matched_r4/hyres_found.log 2>&1 \
  || echo "=== train stage hit its budget ($(date)) — evaluating best checkpoint"

CKPT=$(ls -t matched_r4/hyres_found/checkpoint_best_*.msgpack 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then
  echo "!!! no checkpoint produced"; exit 1
fi
for coder in host tpu; do
  echo "=== hyres_found eval ($coder) of $CKPT ($(date))"
  bash scripts/chainstage.sh timeout 3600 python -m hyres_tpu.cli.inference \
      --checkpoint "$CKPT" --model hyres --coder $coder \
      --N 128 --M 192 --jpeg-quality 1 \
      --input data/ds/test --output matched_r4/eval/hyres_found_$coder \
      > matched_r4/eval/hyres_found_$coder.log 2>&1 \
    || echo "!!! hyres_found $coder eval failed"
  tail -2 matched_r4/eval/hyres_found_$coder/metrics.csv 2>/dev/null
done

# equal-rate comparison against classical libjpeg on the same held-out
# images (the single-lambda analog of the round-3 BD-rate row): bracket
# our bpp on the libjpeg quality sweep and report the PSNR gap.
echo "=== jpeg equal-rate comparison ($(date))"
python - <<'EOF' 2>&1 | tee matched_r4/hyres_found_vs_jpeg.txt
import csv, io
from pathlib import Path
import numpy as np
from PIL import Image

p = Path("matched_r4/eval/hyres_found_host/metrics.csv")
avg = [r for r in csv.DictReader(open(p))
       if r.get("filename", "").startswith("average")]
ours_bpp = float(avg[-1]["total_bpp"]); ours_psnr = float(avg[-1]["psnr"])

pts = []
imgs = [np.asarray(Image.open(f).convert("RGB"), np.float64)
        for f in sorted(Path("data/ds/test").glob("*.png"))]
for q in (5, 10, 15, 20, 25, 30, 35, 40, 50, 60, 70):
    bpps, psnrs = [], []
    for a in imgs:
        b = io.BytesIO()
        Image.fromarray(a.astype(np.uint8)).save(b, "JPEG", quality=q)
        dec = np.asarray(Image.open(b).convert("RGB"), np.float64)
        bpps.append(len(b.getvalue()) * 8 / (a.shape[0] * a.shape[1]))
        psnrs.append(-10 * np.log10(np.mean(((a - dec) / 255) ** 2)))
    pts.append((np.mean(bpps), np.mean(psnrs)))
    print(f"  libjpeg q={q:2d}: {pts[-1][0]:.4f} bpp {pts[-1][1]:.2f} dB")
jp = np.interp(ours_bpp, [b for b, _ in pts], [s for _, s in pts])
print(f"hyres_found (host coder): {ours_bpp:.4f} bpp {ours_psnr:.2f} dB | "
      f"libjpeg at equal rate: {jp:.2f} dB | delta {ours_psnr - jp:+.2f} dB")
EOF
echo "=== stage 5 done ($(date))"
