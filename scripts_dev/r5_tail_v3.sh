#!/bin/bash
# Round-5 TPU tail driver, v3.  Replaces r5_tail.sh, which had a
# monitoring bug: after ITS OWN resume of the trainer it blocked in
# `wait $!`, so the early-stop-at-target SIGINT could never fire and the
# run would have consumed the whole post-run queue window.  v3 polls
# (never waits), resumes detached (setsid — the trainer survives watcher
# and session deaths), git-commits each queue artifact as it lands
# (three session/VM resets this round have shown that anything
# uncommitted can vanish at any moment), and snapshots the run's curve
# evidence into artifacts/ every ~30 min as reset insurance.
#
# Launch:  setsid nohup bash scripts_dev/r5_tail_v3.sh \
#            > experiments/r5_tail_v3.log 2>&1 < /dev/null &
#
# Queue (VERDICT-r4 next-steps #1-#6), strictly sequential, one TPU job
# at a time:
#   1. flagship run to target (poll + resume loop, SIGINT at target)
#   2. post_flagship_r5.sh  — export_g + eval tables + TRAINCURVE_r05
#   3. bench_edit.py        — BENCH_EDIT_r05.json (best-of-3)
#   4. probe_serve_pad.py   — V5E_MS_PER_FWD serving-table numbers
#   5. live_fire_r5.sh      — collapse-guard live fire (flagship fork)
#   6. make_estkernel_e2e.py
#   7. JPEG long run (deadline-capped) + QF evals + traincurve artifact
cd /root/repo
RUN=experiments/run_flagship_r5
PIDFILE=/tmp/flagship_r5.pid
target() { cat experiments/r5_tail_target 2>/dev/null || echo 10400; }

last_step() {
  tail -c 40000 "$RUN/driver.log" 2>/dev/null \
    | grep -o '"step": [0-9]*' | tail -1 | grep -o '[0-9]*'
}

train_pid() {
  local p
  p=$(cat "$PIDFILE" 2>/dev/null) || return 1
  [ -n "$p" ] || return 1
  grep -q "train_sr" "/proc/$p/cmdline" 2>/dev/null || return 1
  echo "$p"
}

ci() {  # ci <message> <path...> — commit, never fail the queue
  local msg="$1"; shift
  git add -A "$@" 2>/dev/null || true
  git commit -q -m "$msg" || true
}

snapshot() {
  mkdir -p artifacts/run_flagship_r5
  cp "$RUN/logs.npz" artifacts/run_flagship_r5/ 2>/dev/null
  tail -c 100000 "$RUN/driver.log" \
    > artifacts/run_flagship_r5/driver_tail.log 2>/dev/null
  ci "Flagship-run evidence snapshot at step $(last_step)" \
    artifacts/run_flagship_r5
}

echo "=== r5 tail watcher v3 start $(date)"
RESUMES=0
LAST_SNAP=$(date +%s)
while true; do
  STEP=$(last_step); STEP=${STEP:-0}
  NITER=$(target)
  P=$(train_pid)
  if [ -n "$P" ]; then
    if [ "$STEP" -ge "$NITER" ]; then
      echo "=== target $NITER reached at step $STEP — SIGINT $P $(date)"
      kill -INT "$P"
      while kill -0 "$P" 2>/dev/null; do sleep 10; done
      echo "=== trainer exited after SIGINT $(date)"
      break
    fi
    NOW=$(date +%s)
    if [ $((NOW - LAST_SNAP)) -ge 1800 ]; then
      snapshot; LAST_SNAP=$NOW
    fi
    sleep 60; continue
  fi
  if [ "$STEP" -ge $((NITER - 10)) ]; then
    echo "=== flagship run complete at step $STEP $(date)"; break
  fi
  if [ "$RESUMES" -ge 5 ]; then
    echo "=== giving up resuming after 5 attempts (step $STEP) $(date)"
    break
  fi
  RESUMES=$((RESUMES + 1))
  echo "=== train proc dead at step $STEP — resume #$RESUMES $(date)"
  OPT=$RUN/opt.json
  setsid nohup python -m exsr.apps.train_sr --opt $OPT \
    --hr_dir experiments/data/train --val_hr_dir experiments/data/val \
    --exp_dir $RUN --val_freq 250 --ckpt_freq 500 --print_freq 50 \
    --max_keep 8 --accum_g 2 --collapse_guard --niter 14000 --resume \
    >> $RUN/driver.log 2>&1 < /dev/null &
  echo $! > "$PIDFILE"
  sleep 180  # resume compile warmup before the liveness poll judges it
done
snapshot

set -x
bash scripts_dev/post_flagship_r5.sh \
  > experiments/post_flagship_r5.log 2>&1
ci "Flagship post-run artifacts: export_g, eval tables (Z=0 + uniform sweep), TRAINCURVE_r05" \
  TRAINCURVE_r05.json artifacts/run_flagship_r5

python bench_edit.py BENCH_EDIT_r05.json \
  > experiments/bench_edit_r5.log 2>&1
ci "Edit-latency benchmark recapture (best-of-3 per point, b8/b16 amortized rows)" \
  BENCH_EDIT_r05.json

python scripts_dev/probe_serve_pad.py \
  > experiments/serve_pad_r5.log 2>&1 || true
cp experiments/serve_pad_r5.log artifacts/serve_pad_r5.log 2>/dev/null
ci "Serving pad-bucket probe measurements (V5E_MS_PER_FWD calibration data)" \
  artifacts/serve_pad_r5.log

if [ -x scripts_dev/live_fire_r5.sh ]; then
  bash scripts_dev/live_fire_r5.sh > experiments/live_fire_r5.log 2>&1 || true
  ci "Collapse-guard live fire from the flagship fork (lr_D 1e-5 -> 3e-4)" \
    artifacts/collapse_fire_r5
fi

python scripts_dev/make_estkernel_e2e.py \
  > experiments/estkernel_e2e_r5.log 2>&1 || true
ci "Estimated-kernel end-to-end artifact: bicubic-assumed vs KernelGAN-estimated vs oracle CEM with the flagship export" \
  artifacts/estkernel_e2e_r5

# JPEG long run, deadline-capped so the chip is free for the
# end-of-round bench: clean-SIGINT the trainer at the cap (checkpoints
# every 500 keep the state), then run the QF evals regardless.
DEADLINE=$(cat experiments/r5_jpeg_deadline 2>/dev/null \
  || date -d '23:45 today' +%s)
NOW=$(date +%s)
JPEG_CAP_S=$((DEADLINE - NOW))
[ "$JPEG_CAP_S" -lt 900 ] && JPEG_CAP_S=900
EXP=experiments/run_jpeg_r5
JCOMMON="--data_dir experiments/data/train --val_dir experiments/data/val \
  --patch 256 --batch 16 --nf 320 --nb 10 --latent_channels 64 \
  --qf_min 5 --qf_max 50 --exp_dir $EXP --val_freq 500 --ckpt_freq 500 \
  --print_freq 100"
timeout --signal=INT --kill-after=120 "$JPEG_CAP_S" \
  python -m exsr.apps.train_jpeg $JCOMMON --niter 8000 \
  > experiments/run_jpeg_r5.log 2>&1
for QF in 10 30 50; do
  python -m exsr.apps.eval_jpeg --data_dir experiments/data/val --qf $QF \
    --nf 320 --nb 10 --latent_channels 64 --checkpoint $EXP/ckpt \
    --out_dir $EXP/eval_qf$QF --num_z 3 \
    >> experiments/run_jpeg_r5.log 2>&1
done
python scripts_dev/make_traincurve_jpeg_r5.py \
  >> experiments/run_jpeg_r5.log 2>&1 || true
ci "JPEG long-run artifacts: TRAINCURVE_JPEG_r05 + QF 10/30/50 eval tables" \
  TRAINCURVE_JPEG_r05.json artifacts/run_jpeg_r5
echo "=== r5 tail v3 done $(date)"
