#!/bin/bash
# Round 3, after run_matched.sh: held-out eval of the four matched-budget
# artifacts (same lambda=0.013, same 1000-epoch budget, disjoint split)
# with real bitstreams under both coders -> the repo-internal version of
# the reference's comparative table (README.md:110-126): bpp / PSNR /
# encode+decode per family at a matched budget.
# NO set -e: unattended behind the tunnel waiter — one family/coder
# failure must not cost the remaining evals.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p matched_r3/eval

for fam in checkerboard cheng2020 hyres elic; do
  BEST=$(ls -1 matched_r3/$fam/checkpoint_best_*.msgpack 2>/dev/null | sort -V | tail -1)
  [ -n "$BEST" ] || { echo "skip $fam (no checkpoint)"; continue; }
  for coder in host tpu; do
    echo "=== eval $fam/$coder: $BEST ($(date))"
    bash scripts/chainstage.sh timeout 5400 python -m hyres_tpu.cli.inference \
      --checkpoint "$BEST" --model $fam \
      --input data/ds/test --output matched_r3/eval/${fam}_$coder \
      --coder $coder > matched_r3/eval/${fam}_$coder.log 2>&1 \
      || echo "!!! eval $fam/$coder failed ($(date))"
  done
done
echo "=== matched eval complete ($(date))"
