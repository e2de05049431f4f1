#!/bin/bash
# VERDICT-r4 next #1: the flagship-width (nb=23 nf=64 gc=32) GAN-phase
# training run on the real TPU v5e.  No flagship-width checkpoint
# survived from r3 (only its eval artifacts), so the run rebuilds the
# init phase from scratch (1000 pixel+range steps — r3's init plateaued
# by ~step 400 on this tile dataset) and then trains the wgan-gp GAN
# phase with BOTH rollback guards armed: the reference-semantics
# D-loss-STD trigger at std_4_lr_drop=1.6 (train_explorable_SR.json:58
# commented value) and the exsr symmetric-collapse guard
# (--collapse_guard).  --accum_g 2 for the r3-measured HBM ceiling
# (adversarial G step at batch 16 / patch 208 needs 17.2 GB vs 15.75);
# --max_keep 8 so rollback restore targets survive pruning (the r4 run
# lost its pre-divergence checkpoint to max_to_keep=3).
set -e
cd /root/repo
OPT=experiments/run_flagship_r5/opt.json
DIRS="--hr_dir experiments/data/train --val_hr_dir experiments/data/val"
EXP="--exp_dir experiments/run_flagship_r5"
COMMON="--opt $OPT $DIRS $EXP --val_freq 250 --ckpt_freq 500 --print_freq 50 --max_keep 8 --accum_g 2"

# trainer pid -> /tmp/flagship_r5.pid so the deadline SIGINT can target
# the exact recorded pid (never pattern-matched)
echo "=== init phase to 1000 $(date)"
python -m exsr.apps.train_sr $COMMON --init_phase --niter 1000 &
echo $! > /tmp/flagship_r5.pid
wait $!
echo "=== GAN phase $(date)"
python -m exsr.apps.train_sr $COMMON --collapse_guard --niter 14000 --resume &
echo $! > /tmp/flagship_r5.pid
wait $!
echo "=== done $(date)"
