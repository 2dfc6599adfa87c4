#!/bin/bash
# Final unattended stage of the slim5b chain: once the shift gate log exists,
# apply the PRE-REGISTERED ship bar (RESULTS_r5 §8) and, if green, ship the
# candidate through the policy slot and re-run the driver-style bench.
# Decision + numbers land in queue_logs/slim5b_decision.log either way.
set -u
cd /root/repo
GLOG=benchmarks/queue_logs/slim5b_shift.log
DLOG=benchmarks/queue_logs/slim5b_distill.log
OUT=benchmarks/queue_logs/slim5b_decision.log

for i in $(seq 1 480); do            # up to 4 h
  grep -q "^gate rc=" "$GLOG" 2>/dev/null && break
  sleep 30
done
if ! grep -q "^gate rc=0" "$GLOG" 2>/dev/null; then
  echo "gate never completed cleanly — no decision" > "$OUT"
  exit 1
fi

python - "$DLOG" "$GLOG" <<'EOF' > "$OUT" 2>&1
import json, re, sys

dlog, glog = open(sys.argv[1]).read(), open(sys.argv[2]).read()

# bench-991 val minimum from the distill log's own validation pass
m = re.search(r"val seed 991: fg IoU vs labels mean [\d.]+ min ([\d.]+)", dlog)
val991 = float(m.group(1)) if m else 0.0

shift = json.loads([l for l in glog.splitlines()
                    if l.startswith('{"shift_eval"')][-1])["shift_eval"]

# Pre-registered bar (RESULTS_r5 §8): meet or beat shipped slim4 everywhere.
bar = {"val991": 0.99949, "crescent": 0.99147, "illum": 0.99812,
       "lobulated": 0.99971, "multiorgan": 0.99919}
got = {"val991": val991}
for fam in ("crescent", "illum", "lobulated", "multiorgan"):
    got[fam] = shift[fam]["student_fg_iou_min"]

verdict = all(got[k] >= bar[k] for k in bar)
print(json.dumps({"slim5b_gates": {k: {"got": got[k], "bar": bar[k],
                                       "pass": got[k] >= bar[k]}
                                   for k in bar},
                  "ship": verdict}))
sys.exit(0 if verdict else 3)
EOF
rc=$?
if [ "$rc" -eq 0 ]; then
  cp models/flagship_slim5_cand2.ckpt models/flagship_slim5.ckpt
  echo "SHIPPED as models/flagship_slim5.ckpt — running bench" >> "$OUT"
  timeout 1800 python bench.py > benchmarks/queue_logs/bench_slim5.log 2>&1
  echo "bench rc=$?" >> "$OUT"
  tail -1 benchmarks/queue_logs/bench_slim5.log >> "$OUT"
else
  echo "REJECTED (rc=$rc) — slim4 stays the serving student" >> "$OUT"
fi
