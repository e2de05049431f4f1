#!/bin/bash
# Round-5 TPU tail driver: babysit the flagship run to completion
# (resuming it if the process dies before the target — the session
# hosting it was killed once already this round), early-stop it cleanly
# at the adjustable target, then execute the post-run TPU queue STRICTLY
# SEQUENTIALLY (one TPU job at a time, verify-skill rule).
#
# Launch detached so it survives session restarts:
#   setsid nohup bash scripts_dev/r5_tail.sh > experiments/r5_tail.log 2>&1 &
#
# Queue (VERDICT-r4 next-steps #1-#6):
#   1. flagship run to target (resume-on-death loop, SIGINT-at-target —
#      clean SIGINT stop/resume is safe, verify-skill gotchas)
#   2. post_flagship_r5.sh  — export_g + eval tables + TRAINCURVE_r05
#   3. bench_edit.py        — BENCH_EDIT_r05.json (best-of-3 repeats)
#   4. probe_serve_pad.py   — the V5E_MS_PER_FWD serving table numbers
#   5. collapse-guard live fire (resume the staged diverged state)
#   6. make_estkernel_e2e.py
#   7. JPEG long run (deadline-capped) + QF evals
# Commits/doc updates happen interactively as each artifact lands.
#
# PID discipline: the trainer pid lives in /tmp/flagship_r5.pid (written
# here on resume); liveness and the early-stop SIGINT go through that
# exact pid + a /proc cmdline check — NEVER pattern-kill.
cd /root/repo
RUN=experiments/run_flagship_r5
PIDFILE=/tmp/flagship_r5.pid
# target step, adjustable mid-flight via experiments/r5_tail_target
target() { cat experiments/r5_tail_target 2>/dev/null || echo 14000; }

last_step() {
  # the trainer's metric JSON goes to stdout; every launch of this run
  # so far redirected it to driver.log — keep that canonical
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

echo "=== r5 tail watcher v2 start $(date)"
RESUMES=0
while true; do
  STEP=$(last_step); STEP=${STEP:-0}
  NITER=$(target)
  P=$(train_pid)
  if [ -n "$P" ]; then
    if [ "$STEP" -ge "$NITER" ]; then
      echo "=== target $NITER reached at step $STEP — SIGINT $P $(date)"
      kill -INT "$P"
      # clean KeyboardInterrupt exit; wait for it (no timeout-kill: the
      # TPU wedge hazard is SIGKILL mid-execution)
      while kill -0 "$P" 2>/dev/null; do sleep 10; done
      echo "=== trainer exited after SIGINT $(date)"
      break
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
  COMMON="--opt $OPT --hr_dir experiments/data/train \
    --val_hr_dir experiments/data/val --exp_dir $RUN --val_freq 250 \
    --ckpt_freq 500 --print_freq 50 --max_keep 8 --accum_g 2"
  python -m exsr.apps.train_sr $COMMON --collapse_guard \
    --niter 14000 --resume >> $RUN/driver.log 2>&1 &
  echo $! > "$PIDFILE"
  wait $!
  echo "=== train proc exited (rc $?) $(date)"
done

set -x
bash scripts_dev/post_flagship_r5.sh \
  > experiments/post_flagship_r5.log 2>&1
python bench_edit.py BENCH_EDIT_r05.json \
  > experiments/bench_edit_r5.log 2>&1
python scripts_dev/probe_serve_pad.py \
  > experiments/serve_pad_r5.log 2>&1
# the staged r4 diverged checkpoint (experiments/run50k2) was wiped by
# the VM reset — the live fire is re-staged as a from-scratch small-run
# divergence provocation if the script exists
if [ -x scripts_dev/live_fire_r5.sh ]; then
  bash scripts_dev/live_fire_r5.sh > experiments/live_fire_r5.log 2>&1 || true
fi
python scripts_dev/make_estkernel_e2e.py \
  > experiments/estkernel_e2e_r5.log 2>&1
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
echo "=== r5 tail done $(date)"
