#!/bin/bash
# The geometry prize, revisited: slim5b's "capacity binds" was partly
# dilution — under the SAME diluted recipe, base48's val991 (0.99918) was
# within 6e-5 of base64's (0.99924).  If a base64 mixture variant (slim4d
# or slim4e) clears the bar, re-run ITS exact recipe at base48: if base48
# clears the same bar, it replaces the shipped slim5 (last ship wins) at
# 8963 slices/s raw (+22%).  If both base64 variants reject, base48 has no
# evidential path and this chain exits without spending TPU time.
set -u
cd /root/repo
D4=benchmarks/queue_logs/slim4d_decision.log
E4=benchmarks/queue_logs/slim4e_decision.log
DLOG=benchmarks/queue_logs/slim5c_distill.log
GLOG=benchmarks/queue_logs/slim5c_shift.log
OUT=benchmarks/queue_logs/slim5c_decision.log

KINDS=""
for i in $(seq 1 720); do
  if grep -q "SHIPPED" "$D4" 2>/dev/null; then
    KINDS="crescent,illum"; break
  fi
  if grep -q "SHIPPED" "$E4" 2>/dev/null; then
    KINDS="crescent,illum,multiorgan"; break
  fi
  # both decided without a ship -> nothing to mirror
  if grep -q "REJECTED\|failed\|no decision" "$E4" 2>/dev/null; then
    exit 0
  fi
  sleep 30
done
[ -n "$KINDS" ] || exit 0

for i in $(seq 1 240); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; \
x=jnp.ones((8,8)); print(int((x@x)[0,0]))" > /dev/null 2>&1; then
    break
  fi
  sleep 60
done

timeout 4500 python benchmarks/train_slim.py 27000 1920 2 4 48 \
  models/flagship_slim5c_cand.ckpt 1 unet 0.2 "$KINDS" > "$DLOG" 2>&1
echo "distill rc=$?" >> "$DLOG"
grep -q "^distill rc=0" "$DLOG" || { echo "distill failed" > "$OUT"; exit 1; }

timeout 1800 python benchmarks/eval_shift.py 24 \
  models/flagship_slim5c_cand.ckpt > "$GLOG" 2>&1
echo "gate rc=$?" >> "$GLOG"
grep -q "^gate rc=0" "$GLOG" || { echo "gate failed" > "$OUT"; exit 1; }

python - "$DLOG" "$GLOG" "$KINDS" <<'EOF' > "$OUT" 2>&1
import json, re, sys

dlog, glog = open(sys.argv[1]).read(), open(sys.argv[2]).read()
m = re.search(r"val seed 991: fg IoU vs labels mean [\d.]+ min ([\d.]+)", dlog)
val991 = float(m.group(1)) if m else 0.0
shift = json.loads([l for l in glog.splitlines()
                    if l.startswith('{"shift_eval"')][-1])["shift_eval"]
bar = {"val991": 0.99949, "crescent": 0.99147, "illum": 0.99812,
       "lobulated": 0.99971, "multiorgan": 0.99919}
got = {"val991": val991}
for fam in ("crescent", "illum", "lobulated", "multiorgan"):
    got[fam] = shift[fam]["student_fg_iou_min"]
verdict = all(got[k] >= bar[k] for k in bar) and got["crescent"] > bar["crescent"]
print(json.dumps({"slim5c_gates": {k: {"got": got[k], "bar": bar[k]}
                                   for k in bar},
                  "in_pool": sys.argv[3].split(","),
                  "geometry": "base48_d2 (8963 slices/s raw)",
                  "crescent_must_improve": got["crescent"] > bar["crescent"],
                  "ship": verdict}))
sys.exit(0 if verdict else 3)
EOF
rc=$?
if [ "$rc" -eq 0 ]; then
  cp models/flagship_slim5c_cand.ckpt models/flagship_slim5.ckpt
  echo "SHIPPED as models/flagship_slim5.ckpt (base48) — running bench" >> "$OUT"
  timeout 1800 python bench.py > benchmarks/queue_logs/bench_slim5c.log 2>&1
  echo "bench rc=$?" >> "$OUT"
  tail -1 benchmarks/queue_logs/bench_slim5c.log >> "$OUT"
  timeout 1800 python benchmarks/exp_disagree.py 24 \
    models/flagship_slim5.ckpt > benchmarks/queue_logs/disagree_slim5c.log 2>&1
  echo "retune rc=$?" >> benchmarks/queue_logs/disagree_slim5c.log
else
  echo "REJECTED (rc=$rc) — the base64 ship stands" >> "$OUT"
fi
