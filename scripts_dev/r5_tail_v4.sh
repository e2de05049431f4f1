#!/bin/bash
# Round-5 flagship-run watcher, v4 (final form).  v3's fix stands (poll,
# never block in wait); v4 additionally moves the post-run queue into
# its own file (scripts_dev/r5_queue.sh) so the queue stays EDITABLE
# while this watcher runs — bash reads an executing script
# incrementally, so editing the inline queue of a live watcher would
# corrupt it mid-round.
#
# Launch:  setsid nohup bash scripts_dev/r5_tail_v4.sh \
#            > experiments/r5_tail_v4.log 2>&1 < /dev/null &
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

snapshot() {
  mkdir -p artifacts/run_flagship_r5
  cp "$RUN/logs.npz" artifacts/run_flagship_r5/ 2>/dev/null
  tail -c 100000 "$RUN/driver.log" \
    > artifacts/run_flagship_r5/driver_tail.log 2>/dev/null
  git add -A artifacts/run_flagship_r5 2>/dev/null || true
  git commit -q -m "Flagship-run evidence snapshot at step $(last_step)" \
    || true
}

echo "=== r5 tail watcher v4 start $(date)"
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
  setsid nohup python -m exsr.apps.train_sr --opt $RUN/opt.json \
    --hr_dir experiments/data/train --val_hr_dir experiments/data/val \
    --exp_dir $RUN --val_freq 250 --ckpt_freq 500 --print_freq 50 \
    --max_keep 8 --accum_g 2 --collapse_guard --niter 14000 --resume \
    >> $RUN/driver.log 2>&1 < /dev/null &
  echo $! > "$PIDFILE"
  sleep 180  # resume compile warmup before the liveness poll judges it
done
snapshot
exec bash scripts_dev/r5_queue.sh
