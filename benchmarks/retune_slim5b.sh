#!/bin/bash
# Last unattended stage: if slim5b shipped, re-measure the disagree routing
# curve with the new serving student so the CLI threshold default can be
# re-tuned from evidence (queue_logs/disagree_slim5.log).
set -u
cd /root/repo
DEC=benchmarks/queue_logs/slim5b_decision.log

for i in $(seq 1 600); do            # up to 5 h
  if grep -q "REJECTED" "$DEC" 2>/dev/null; then
    exit 0                           # nothing to retune
  fi
  grep -q "^bench rc=" "$DEC" 2>/dev/null && break
  sleep 30
done
grep -q "SHIPPED" "$DEC" 2>/dev/null || exit 0

timeout 1800 python benchmarks/exp_disagree.py 24 \
  models/flagship_slim5.ckpt > benchmarks/queue_logs/disagree_slim5.log 2>&1
echo "retune rc=$?" >> benchmarks/queue_logs/disagree_slim5.log
