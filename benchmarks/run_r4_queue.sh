#!/bin/bash
# Round-4 TPU measurement queue (ROADMAP "first things to run when a TPU
# session opens").  Run ONE at a time (concurrent TPU jobs contaminate each
# other); each step logs to benchmarks/queue_logs/.  Safe to re-run: every
# step is a measurement, not a mutation.
#
# Usage:  bash benchmarks/run_r4_queue.sh   (from the repo root, axon env)
set -u
cd "$(dirname "$0")/.." || exit 1
mkdir -p benchmarks/queue_logs

# After a step is timeout-killed (rc 124), the TPU tunnel is often wedged
# for 15+ minutes (CLAUDE.md: device enumeration works, execution hangs);
# launching the next step straight into the wedge burns its whole timeout
# producing garbage.  Probe with a tiny bounded matmul and wait for
# recovery (bounded) before proceeding.
wait_for_backend() {
  for _ in $(seq 1 10); do
    if timeout 120 python -c \
        "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(int((x@x)[0,0]))" \
        > /dev/null 2>&1; then
      return 0
    fi
    echo "    backend unresponsive; waiting 120 s before re-probe"
    sleep 120
  done
  echo "    backend still unresponsive after ~40 min of probes"
  return 1
}

run() {
  local name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 1800 "$@" > "benchmarks/queue_logs/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date +%H:%M:%S) ==="
  if [ "$rc" -eq 124 ]; then
    echo "    $name hit the 30-min timeout (likely tunnel wedge); probing"
    wait_for_backend || echo "    continuing anyway — later rcs suspect"
  fi
}

# 1. Gate re-confirmation after the hardening sweep (p50 now uses a
#    realistic slice; expect p50 a few ms higher and honest).
run bench python bench.py

# 2. Geometry neighbors at batch 128 (raw speed; decides whether a base-48
#    re-distill is worth the 21600-step schedule).
run slim5_geom python benchmarks/exp_slim5_geom.py

# 3/4. First runs on the stable crc32 seeds (cross-script pools now
#      byte-matched; within-script conclusions were already valid).
run disagree python benchmarks/exp_disagree.py
run union python benchmarks/exp_union.py

# 5. Shift eval on the stable seeds (records the shipped student's OOD floor).
run eval_shift python benchmarks/eval_shift.py

# 6. Router cost at serving batch (re-pin the +9%/+89%/+102% account).
run cascade_cost python benchmarks/exp_cascade_cost.py

echo "queue done $(date)"
