#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the checkerboard
# requeue (retrain + full matched-budget eval). Logs to matched_r3/.
cd /root/repo
echo "waiting for TPU tunnel ($(date))"
while true; do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu"
EOF
  then
    echo "TPU up ($(date)) — starting run_cb_requeue.sh"
    bash run_cb_requeue.sh
    exit $?
  fi
  sleep 120
done
