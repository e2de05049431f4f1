#!/bin/bash
# Resume the 50k run's GAN phases (after phase 1 init completed to 2000).
set -e
cd /root/repo
OPT=experiments/run50k/opt.json
DIRS="--hr_dir experiments/data/train --val_hr_dir experiments/data/val"
EXP="--exp_dir experiments/run50k"
COMMON="--opt $OPT $DIRS $EXP --val_freq 250 --ckpt_freq 1000 --print_freq 100"
echo "=== phase 2a: GAN to 30000 $(date)"
python -m exsr.apps.train_sr $COMMON --niter 30000 --resume
echo "=== phase 2b: resumed GAN to 52000 $(date)"
python -m exsr.apps.train_sr $COMMON --niter 52000 --resume
echo "=== done $(date)"
