#!/bin/sh
# Pre-warm the persistent XLA compile cache (.jax_cache) for the exact
# bench path, so a subsequent driver `python bench.py` run spends seconds
# on cached program loads instead of minutes on cold compiles through the
# TPU tunnel (round 3 lost its capture to exactly this: BENCH_r03 rc=124).
#
# Run this from the measurement chain (or manually) any time the coder /
# model code changes. Generous deadlines: this run IS the compile.
cd "$(dirname "$0")/.." || exit 1
HYRES_BENCH_DEADLINE_S=3000 HYRES_BENCH_TOTAL_S=3400 \
    timeout 3600 python bench.py > /tmp/bench_warm.out 2>&1
rc=$?
tail -n 3 /tmp/bench_warm.out
echo "bench_warm: rc=$rc"
exit $rc
