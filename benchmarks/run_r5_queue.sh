#!/bin/bash
# Round-5 TPU measurement queue — run AFTER the teacher regeneration chain
# (benchmarks/train_flagship.py 400 ; benchmarks/robustify.py teacher 3000)
# has produced models/flagship_synth.ckpt.  One job at a time (concurrent
# TPU runs contaminate each other); each step logs to benchmarks/queue_logs/.
# Every step is a measurement, not a mutation; safe to re-run.
#
# Usage:  bash benchmarks/run_r5_queue.sh   (from the repo root, axon env)
set -u
cd "$(dirname "$0")/.." || exit 1
mkdir -p benchmarks/queue_logs

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

# 1. Driver-style gates with the regenerated teacher present: the agreement
#    gate must print non-null >= 0.999 (VERDICT r4 item 1 "done" bar).
run bench python bench.py

# 2/3. Router evals on the crc32-seed pools, teacher-populated; exp_disagree
#      now prints the px threshold realizing each routing budget (item 3).
run disagree python benchmarks/exp_disagree.py
run union python benchmarks/exp_union.py

# 4. Shift eval, teacher columns populated (records the OOD floor that the
#    committed docs must match — item 2's reconciliation contract).
run eval_shift python benchmarks/eval_shift.py

# 5. Device-resident config-4 e2e (item 5: an observed rate with transport
#    staged out, replacing the component-sum budget).
run device_resident python benchmarks/exp_device_resident.py --out benchmarks/results_r5_device_resident.json

echo "queue done $(date)"
