#!/bin/bash
# Routing-target lever (runs AFTER the student-side decision tree settles):
# fine-tune a crescent-in-family fallback (robustify_v2.py — the shipped
# flagship_synth.ckpt lineage anchor is untouched) and re-measure the
# disagree routing curve against it.  RESULTS_r5 §3's residual is the
# motivation: routed pooled min tops out at 0.99706 because the v1 teacher
# bottoms at 0.98491 on held-out crescent.  All student-side mixture
# candidates rejected (capacity binds at student scale); the 31 M fallback
# has no measured capacity bind, so this is the remaining accuracy lever.
set -u
cd /root/repo
E4=benchmarks/queue_logs/slim4e_decision.log
C5=benchmarks/queue_logs/slim5c_decision.log
VLOG=benchmarks/queue_logs/teacher_v2.log
DLOG=benchmarks/queue_logs/disagree_v2.log
OUT=benchmarks/queue_logs/teacher_v2_decision.log

# wait for slim4e to decide (up to 6 h)
for i in $(seq 1 720); do
  grep -q "SHIPPED\|REJECTED\|failed" "$E4" 2>/dev/null && break
  sleep 30
done
grep -q "SHIPPED\|REJECTED\|failed" "$E4" 2>/dev/null || exit 0
# if slim4e shipped, slim5c mirrors it at base48 — wait for its verdict too
if grep -q "SHIPPED" "$E4" 2>/dev/null; then
  for i in $(seq 1 360); do
    grep -q "SHIPPED\|REJECTED\|failed" "$C5" 2>/dev/null && break
    sleep 30
  done
fi

for i in $(seq 1 240); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; \
x=jnp.ones((8,8)); print(int((x@x)[0,0]))" > /dev/null 2>&1; then
    break
  fi
  sleep 60
done

timeout 2400 python benchmarks/robustify_v2.py 3000 > "$VLOG" 2>&1
rc=$?
echo "robustify_v2 rc=$rc" >> "$VLOG"
if [ "$rc" -ne 0 ]; then
  echo "teacher_v2 gate failed or died (rc=$rc) — v1 stays the routing target" > "$OUT"
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
    r"\[teacher_v2\] (\S+)\s+mean [\d.]+ min ([\d.]+)", vlog))
curve = {}
for m in re.finditer(r"route\s+(\d+)% \(thr_px\s+(-?\d+)\) -> pooled min "
                     r"([\d.]+) mean ([\d.]+)", dlog):
    curve[int(m.group(1))] = {"thr_px": int(m.group(2)),
                              "min": float(m.group(3)),
                              "mean": float(m.group(4))}
print(json.dumps({
    "teacher_v2_family_mins": {k: float(v) for k, v in mins.items()},
    "held_out": ["multiorgan"],
    "student": sys.argv[3],
    "routing_curve_v2": curve,
    "v1_reference_10pct_min": 0.99706,
    "improves_10pct": curve.get(10, {}).get("min", 0.0) > 0.99706,
}))
EOF
echo "done $(date -Is)" >> "$OUT"
