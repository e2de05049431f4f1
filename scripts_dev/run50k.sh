#!/bin/bash
# VERDICT-r3 next #3: the long training run — reduced-width flagship-shaped
# config (same code paths: CEM-wrapped RRDB G + dual MAP/static G step,
# wgan-gp VGG-D, D-verification gating, MultiStepLR [50k,...] schedule,
# std_4_lr_drop=1.6 rollback armed) run past the reference's FIRST LR
# milestone at 50k steps (train_explorable_SR.json:81,108), with a clean
# stop + --resume at 30k to exercise cross-process resume on a real run.
# Flagship-width 50k is out of reach on one chip in one round (measured
# 0.41 GAN-step/s => 34 h); the machinery is identical at this width.
set -e
cd /root/repo
OPT=experiments/run50k/opt.json
DIRS="--hr_dir experiments/data/train --val_hr_dir experiments/data/val"
EXP="--exp_dir experiments/run50k"
COMMON="--opt $OPT $DIRS $EXP --val_freq 250 --ckpt_freq 1000 --print_freq 100"

echo "=== phase 1: init (pixel+range) to 2000 $(date)"
python -m exsr.apps.train_sr $COMMON --niter 2000 --init_phase
echo "=== phase 2a: GAN to 30000 $(date)"
python -m exsr.apps.train_sr $COMMON --niter 30000 --resume
echo "=== phase 2b: resumed GAN to 52000 $(date)"
python -m exsr.apps.train_sr $COMMON --niter 52000 --resume
echo "=== done $(date)"
