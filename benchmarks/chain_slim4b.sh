#!/bin/bash
# Contingency chain: runs ONLY if slim5b (base48 in-family) is REJECTED.
# Re-distills at the SHIPPED base64_d2 geometry with the 25% crescent+illum
# mixture — VERDICT r4 item 3's "fix at the source" at a capacity where the
# robustness transfer is known to hold (RESULTS_r5 §7).  Gated on the same
# pre-registered bar; ships through the policy slot as flagship_slim5.ckpt
# (the slot means "round-5 serving student", not a geometry).
set -u
cd /root/repo
DEC5=benchmarks/queue_logs/slim5b_decision.log
DLOG=benchmarks/queue_logs/slim4b_distill.log
GLOG=benchmarks/queue_logs/slim4b_shift.log
OUT=benchmarks/queue_logs/slim4b_decision.log

for i in $(seq 1 600); do            # up to 5 h for the slim5b chain
  if grep -q "SHIPPED" "$DEC5" 2>/dev/null; then
    exit 0                           # slim5b won; nothing to do
  fi
  grep -q "REJECTED\|no decision" "$DEC5" 2>/dev/null && break
  sleep 30
done
grep -q "REJECTED\|no decision" "$DEC5" 2>/dev/null || exit 0

timeout 3600 python benchmarks/train_slim.py 21600 1536 2 4 64 \
  models/flagship_slim4b_cand.ckpt 1 unet 0.25 > "$DLOG" 2>&1
echo "distill rc=$?" >> "$DLOG"
grep -q "^distill rc=0" "$DLOG" || { echo "distill failed" > "$OUT"; exit 1; }

timeout 1800 python benchmarks/eval_shift.py 24 \
  models/flagship_slim4b_cand.ckpt > "$GLOG" 2>&1
echo "gate rc=$?" >> "$GLOG"
grep -q "^gate rc=0" "$GLOG" || { echo "gate failed" > "$OUT"; exit 1; }

python - "$DLOG" "$GLOG" <<'EOF' > "$OUT" 2>&1
import json, re, sys

dlog, glog = open(sys.argv[1]).read(), open(sys.argv[2]).read()
m = re.search(r"val seed 991: fg IoU vs labels mean [\d.]+ min ([\d.]+)", dlog)
val991 = float(m.group(1)) if m else 0.0
shift = json.loads([l for l in glog.splitlines()
                    if l.startswith('{"shift_eval"')][-1])["shift_eval"]

# Same pre-registered bar as slim5b (meet-or-beat shipped slim4), PLUS the
# point of this chain: crescent must IMPROVE (> slim4's 0.99147, not ==).
bar = {"val991": 0.99949, "crescent": 0.99147, "illum": 0.99812,
       "lobulated": 0.99971, "multiorgan": 0.99919}
got = {"val991": val991}
for fam in ("crescent", "illum", "lobulated", "multiorgan"):
    got[fam] = shift[fam]["student_fg_iou_min"]
verdict = all(got[k] >= bar[k] for k in bar) and got["crescent"] > bar["crescent"]
print(json.dumps({"slim4b_gates": {k: {"got": got[k], "bar": bar[k]}
                                   for k in bar},
                  "crescent_must_improve": got["crescent"] > bar["crescent"],
                  "ship": verdict}))
sys.exit(0 if verdict else 3)
EOF
rc=$?
if [ "$rc" -eq 0 ]; then
  cp models/flagship_slim4b_cand.ckpt models/flagship_slim5.ckpt
  echo "SHIPPED as models/flagship_slim5.ckpt — running bench" >> "$OUT"
  timeout 1800 python bench.py > benchmarks/queue_logs/bench_slim4b.log 2>&1
  echo "bench rc=$?" >> "$OUT"
  tail -1 benchmarks/queue_logs/bench_slim4b.log >> "$OUT"
  timeout 1800 python benchmarks/exp_disagree.py 24 \
    models/flagship_slim5.ckpt > benchmarks/queue_logs/disagree_slim4b.log 2>&1
  echo "retune rc=$?" >> benchmarks/queue_logs/disagree_slim4b.log
else
  echo "REJECTED (rc=$rc) — slim4 stays the serving student" >> "$OUT"
fi
