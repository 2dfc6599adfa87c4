#!/bin/bash
# Round-5 in-family slim5b distill (RESULTS_r5 §7's "one untested lever"):
# base48_d2 re-distilled with 25% crescent+illum in the pool.
# Waits for the TPU tunnel to recover (mid-flight kills wedge it for 15+ min),
# then runs the distill.  Detach with setsid; log to queue_logs.
set -u
cd /root/repo
LOG=benchmarks/queue_logs/slim5b_distill.log
PROBE=/tmp/slim5b_probe.log

echo "[$(date -u +%H:%M:%S)] waiting for TPU tunnel..." > "$PROBE"
for i in $(seq 1 120); do
  if timeout 120 python - <<'EOF' >> "$PROBE" 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); y = x @ x
print("probe ok", int(y[0, 0]))
EOF
  then
    echo "[$(date -u +%H:%M:%S)] tunnel up after $i probes" >> "$PROBE"
    break
  fi
  echo "[$(date -u +%H:%M:%S)] probe $i failed" >> "$PROBE"
  sleep 60
done

python benchmarks/train_slim.py 21600 1536 2 4 48 \
  models/flagship_slim5_cand2.ckpt 1 unet 0.25 > "$LOG" 2>&1
echo "distill rc=$?" >> "$LOG"
