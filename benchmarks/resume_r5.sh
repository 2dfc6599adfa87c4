#!/bin/bash
# Resume the round-5 decision chain after a VM restart (2026-08-19 21:37)
# killed the detached slim4e/slim5c watchers AND wiped the untracked 62 MB
# teacher (models/flagship_synth.ckpt — regenerated 11:25 that morning,
# teacher_regen.log).  Order of operations:
#
#   1. wait out the tunnel (probe loop, up to 4 h — outages measured 6+ h
#      on 2026-08-18, so the loop is generous but bounded)
#   2. rebuild the teacher via the committed recipe (regen_teacher.sh,
#      ~1235 s measured) — train_slim/eval_shift/bench all load it
#   3. relaunch chain_slim4e.sh (slim4d REJECTED is already on disk, so it
#      proceeds straight to the distill) and chain_slim5c.sh (gates on the
#      slim4e decision) as independent detached processes
#
# Log: benchmarks/queue_logs/resume_r5.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/queue_logs/resume_r5.log
{
echo "=== resume_r5 start $(date -Is) ==="
for i in $(seq 1 240); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; \
x=jnp.ones((8,8)); print(int((x@x)[0,0]))" > /dev/null 2>&1; then
    echo "tunnel up after probe $i ($(date -Is))"
    break
  fi
  sleep 60
done

if [ ! -f models/flagship_synth.ckpt ]; then
  bash benchmarks/regen_teacher.sh
fi
if [ ! -f models/flagship_synth.ckpt ]; then
  echo "ABORT: teacher regeneration failed — see teacher_regen.log"
  exit 1
fi
echo "teacher present $(date -Is)"

setsid nohup bash benchmarks/chain_slim4e.sh \
  > benchmarks/queue_logs/chain_slim4e_driver.log 2>&1 < /dev/null &
echo "chain_slim4e pid $!"
setsid nohup bash benchmarks/chain_slim5c.sh \
  > benchmarks/queue_logs/chain_slim5c_driver.log 2>&1 < /dev/null &
echo "chain_slim5c pid $!"
echo "=== resume_r5 handed off $(date -Is) ==="
} > "$LOG" 2>&1
