#!/bin/bash
# Watches the slim5b distill log; when the distill finishes (rc line appears),
# runs the crc32-seed shift gate on the candidate so the decision evidence
# lands unattended even if no interactive session survives to drive it.
set -u
cd /root/repo
DLOG=benchmarks/queue_logs/slim5b_distill.log
GLOG=benchmarks/queue_logs/slim5b_shift.log

for i in $(seq 1 360); do            # up to 3 h
  if grep -q "^distill rc=" "$DLOG" 2>/dev/null; then
    rc=$(grep "^distill rc=" "$DLOG" | tail -1 | cut -d= -f2)
    if [ "$rc" != "0" ]; then
      echo "distill failed rc=$rc — not gating" > "$GLOG"
      exit 1
    fi
    timeout 1800 python benchmarks/eval_shift.py 24 \
      models/flagship_slim5_cand2.ckpt > "$GLOG" 2>&1
    echo "gate rc=$?" >> "$GLOG"
    exit 0
  fi
  sleep 30
done
echo "distill never finished within 3 h" > "$GLOG"
