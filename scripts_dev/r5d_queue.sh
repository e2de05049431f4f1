#!/bin/bash
# Round-5 continuation queue — strictly sequential, ONE TPU job at a time:
#   1. focused edit bench at window 16 with alternative buckets up to 64
#      (chasing the <5 ms/alternative operating point; the first attempt
#      hit the axon wedge and recorded only the watchdog error line)
#   2. probe_layout (PERF.md's lever table cites its output; it was queued
#      in r5c but never executed)
#   3. resume the JPEG long run until $STOP_EPOCH, then QF evals +
#      TRAINCURVE_JPEG_r05 rebuild + commit (scripts_dev/r5d_jpeg.sh)
set -x
cd /root/repo
STOP_EPOCH=${1:?pass absolute stop epoch for the JPEG training window}

echo "=== edit bench $(date)"
BENCH_EDIT_WINDOWS=16 BENCH_EDIT_ALT_BUCKETS=8,16,32,64 \
  timeout 1500 python bench_edit.py /tmp/bench_edit_b32.json \
  > /tmp/bench_edit_b32.log 2>&1
echo "=== edit bench rc=$? $(date)"
if grep -q "e2e_ms_per_step_per_alt_b32" /tmp/bench_edit_b32.json; then
  python scripts_dev/merge_edit_bench.py
  git add BENCH_EDIT_r05.json bench_edit.py scripts_dev/merge_edit_bench.py
  git commit -m "Edit-latency amortized sweep extended to b32/b64 alternative buckets at the 16-LR window (bench_edit gains focused re-measurement env hooks; merged into BENCH_EDIT_r05.json)"
fi

echo "=== probe_layout $(date)"
timeout 900 python scripts_dev/probe_layout.py \
  > /tmp/probe_layout.log 2>&1
echo "=== probe_layout rc=$? $(date)"

NOW=$(date +%s)
TRAIN_SECS=$(( STOP_EPOCH - NOW ))
if [ "$TRAIN_SECS" -gt 300 ]; then
  bash scripts_dev/r5d_jpeg.sh "$TRAIN_SECS"
else
  echo "no JPEG window left (TRAIN_SECS=$TRAIN_SECS)"
fi
echo "=== r5d queue done $(date)"
