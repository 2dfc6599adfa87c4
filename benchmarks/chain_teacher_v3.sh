#!/bin/bash
# Routing-target lever, attempt 2 (see robustify_v3.py's docstring): the
# v2 fine-tune proved the 31 M fallback absorbs crescent in-family with
# no trade anywhere but stopped at crescent min 0.99209 (< the 0.995
# pre-registered bar) with loss converged — a variety problem, not an
# optimization one.  v3 doubles the pool and the crescent share; same
# gate, same save slot, lineage anchor untouched.  If the gate passes,
# re-measure the disagree routing curve against the v3 target and emit
# the improves_10pct decision (reference point: v1's 0.99706).
set -u
cd /root/repo
VLOG=benchmarks/queue_logs/teacher_v3.log
DLOG=benchmarks/queue_logs/disagree_v3.log
OUT=benchmarks/queue_logs/teacher_v3_decision.log

for i in $(seq 1 240); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; \
x=jnp.ones((8,8)); print(int((x@x)[0,0]))" > /dev/null 2>&1; then
    break
  fi
  sleep 60
done

timeout 2700 python benchmarks/robustify_v3.py 4500 > "$VLOG" 2>&1
rc=$?
echo "robustify_v3 rc=$rc" >> "$VLOG"
if [ "$rc" -ne 0 ]; then
  echo "teacher_v3 gate failed or died (rc=$rc) — v1 stays the routing target" > "$OUT"
  exit 1
fi

STUDENT=models/flagship_slim4.ckpt
[ -f models/flagship_slim5.ckpt ] && STUDENT=models/flagship_slim5.ckpt
timeout 1800 python benchmarks/exp_disagree.py 24 "$STUDENT" > "$DLOG" 2>&1
echo "disagree rc=$?" >> "$DLOG"
grep -q "^disagree rc=0" "$DLOG" || { echo "routing re-measure failed" > "$OUT"; exit 1; }

python - "$VLOG" "$DLOG" "$STUDENT" <<'EOF' > "$OUT" 2>&1
import json, re, sys

vlog, dlog = open(sys.argv[1]).read(), open(sys.argv[2]).read()
mins = dict(re.findall(
    r"\[teacher_v3\] (\S+)\s+mean [\d.]+ min ([\d.]+)", vlog))
curve = {}
for m in re.finditer(r"route\s+(\d+)% \(thr_px\s+(-?\d+)\) -> pooled min "
                     r"([\d.]+) mean ([\d.]+)", dlog):
    curve[int(m.group(1))] = {"thr_px": int(m.group(2)),
                              "min": float(m.group(3)),
                              "mean": float(m.group(4))}
print(json.dumps({
    "teacher_v3_family_mins": {k: float(v) for k, v in mins.items()},
    "held_out": ["multiorgan"],
    "student": sys.argv[3],
    "routing_curve_v3": curve,
    "v1_reference_10pct_min": 0.99706,
    "improves_10pct": curve.get(10, {}).get("min", 0.0) > 0.99706,
}))
EOF
echo "done $(date -Is)" >> "$OUT"
