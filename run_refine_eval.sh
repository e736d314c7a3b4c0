#!/bin/bash
# Quantify the refinement stage on held-out images: full pipeline vs
# --skip-postprocessing (reference refine_inference semantics), plus the
# post-trained refine overlay.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
CODEC=$(ls -1 phases_r2/phase0_0.004/checkpoint_best_*.msgpack | tail -1)
POST=$(ls -1 refine_r2/refine_best_*.msgpack 2>/dev/null | tail -1)
mkdir -p refine_eval
for img in data/ds/test/*.png; do
  base=$(basename $img .png)
  python -m hyres_tpu.cli.refine_inference --checkpoint "$CODEC" \
    --input "$img" --output refine_eval/${base}_skip.png --skip-postprocessing
  python -m hyres_tpu.cli.refine_inference --checkpoint "$CODEC" \
    --input "$img" --output refine_eval/${base}_refined.png
  if [ -n "$POST" ]; then
    python -m hyres_tpu.cli.refine_inference --checkpoint "$CODEC" \
      --post-checkpoint "$POST" \
      --input "$img" --output refine_eval/${base}_post.png
  fi
done
python - <<'PY'
import numpy as np
from PIL import Image
from pathlib import Path
rows = {}
for mode in ("skip", "refined", "post"):
    ps = []
    for img in sorted(Path("data/ds/test").glob("*.png")):
        out = Path(f"refine_eval/{img.stem}_{mode}.png")
        if not out.exists():
            continue
        a = np.asarray(Image.open(img).convert("RGB"), np.float32) / 255
        b = np.asarray(Image.open(out).convert("RGB"), np.float32) / 255
        ps.append(-10 * np.log10(np.mean((a - b) ** 2)))
    if ps:
        rows[mode] = np.mean(ps)
for k, v in rows.items():
    print(f"refine_eval {k}: avg PSNR {v:.3f} dB")
PY
