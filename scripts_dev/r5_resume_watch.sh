#!/bin/bash
# Round-5 wedge-recovery watchdog: the axon tunnel wedged spontaneously
# mid-GAN-phase (step ~1200, 22:23 — trainer futex-parked on an RPC that
# never returned; even a trivial matmul then hung).  Per the verify-skill
# gotcha only the remote side can recover, so: probe with a tiny bounded
# op every 2 min, and as soon as the tunnel answers, resume the flagship
# GAN phase from the last checkpoint.  ONE TPU job at a time — the probe
# only runs while the trainer is down, and the loop exits into the
# resumed trainer.
cd /root/repo
while true; do
  if timeout --signal=INT --kill-after=15 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))" > /dev/null 2>&1; then
    echo "=== tunnel live $(date)"
    break
  fi
  echo "=== still wedged $(date)"
  sleep 120
done
OPT=experiments/run_flagship_r5/opt.json
DIRS="--hr_dir experiments/data/train --val_hr_dir experiments/data/val"
EXP="--exp_dir experiments/run_flagship_r5"
COMMON="--opt $OPT $DIRS $EXP --val_freq 250 --ckpt_freq 500 --print_freq 50 --max_keep 8 --accum_g 2"
echo "=== resume GAN phase $(date)"
python -m exsr.apps.train_sr $COMMON --collapse_guard --niter 14000 --resume &
echo $! > /tmp/flagship_r5.pid
wait $!
echo "=== trainer exited rc=$? $(date)"
