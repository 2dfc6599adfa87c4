#!/bin/bash
# Round-5 closing chain (detached; survives session death):
#   1. wait out the tunnel outage (observed 01:04-? UTC 2026-08-20; bench
#      watchdog fired at 600 s — the hours-scale outage mode from CLAUDE.md)
#   2. exp_tta_route.py — the last untried routing signal (TTA-flip
#      self-disagreement), pre-registered bar: pooled min at <=10% actual
#      budget must beat the committed 0.99706 (RESULTS_r5 §3/§11)
#   3. once the CPU pytest sweep is done (log sentinel), re-run bench.py
#      alone on the box for the round-close gate record
# Logs: benchmarks/queue_logs/tta_route.log, bench_r5_close.log
set -u
cd /root/repo
mkdir -p benchmarks/queue_logs
TLOG=benchmarks/queue_logs/tta_route.log
BLOG=benchmarks/queue_logs/bench_r5_close.log

for i in $(seq 1 360); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; \
x=jnp.ones((8,8)); print(int((x@x)[0,0]))" > /dev/null 2>&1; then
    break
  fi
  sleep 60
done

timeout 2400 python benchmarks/exp_tta_route.py 24 > "$TLOG" 2>&1
echo "tta_route rc=$?" >> "$TLOG"

# bench must run with the box otherwise idle: wait for the pytest sweep
for i in $(seq 1 120); do
  grep -q "^rc=" /tmp/pytest_r5_close.log 2>/dev/null && break
  sleep 30
done
sleep 10
timeout 900 python bench.py > "$BLOG" 2>&1
echo "bench rc=$?" >> "$BLOG"
echo "done $(date -Is)" >> "$BLOG"
