#!/bin/bash
# Teacher regeneration chain (VERDICT r4 item 1): rebuilds the untracked
# 62 MB robustified teacher models/flagship_synth.ckpt from a fresh clone.
#
#   stage 1  benchmarks/train_flagship.py 400   — base teacher from scratch
#            (seeds: jax PRNG key 0, numpy default_rng(42); expected
#            val fg IoU >= 0.999; measured 554 s on one v5e chip via tunnel,
#            val fg IoU 0.9998 on the 2026-08-19 rebuild)
#   stage 2  benchmarks/robustify.py teacher 3000 — widen the training
#            family (standard/lobulated/illum; crescent held out), fine-tune
#            IN PLACE at lr 1e-4 (measured 681 s; 2026-08-19 rebuild printed
#            bench-991 min 0.99933, lobulated 0.99971, illum 0.99989,
#            held-out crescent 0.98523 — total chain 1235 s)
#
# The serving students (flagship_slim4*.ckpt, tracked) were distilled FROM
# this artifact; bench.py's agreement gate and the disagree/union cascade
# routers need it present.  Logs to benchmarks/queue_logs/teacher_regen.log.
#
# Usage:  bash benchmarks/regen_teacher.sh   (repo root, axon env)
set -u
cd "$(dirname "$0")/.." || exit 1
mkdir -p benchmarks/queue_logs
LOG=benchmarks/queue_logs/teacher_regen.log
{
echo "=== teacher regeneration chain start $(date -Is) ==="
t0=$(date +%s)
timeout 3000 python benchmarks/train_flagship.py 400
rc1=$?
echo "train_flagship rc=$rc1 elapsed=$(( $(date +%s) - t0 ))s"
if [ $rc1 -ne 0 ]; then echo "ABORT: train_flagship failed"; exit 1; fi
t1=$(date +%s)
timeout 5400 python benchmarks/robustify.py teacher 3000
rc2=$?
echo "robustify teacher rc=$rc2 elapsed=$(( $(date +%s) - t1 ))s"
echo "=== chain done $(date -Is) total=$(( $(date +%s) - t0 ))s ==="
ls -la models/flagship_synth.ckpt
} > $LOG 2>&1
