#!/bin/bash
# VERDICT-r4 next #6: the JPEG twin's long run — train_jpeg at the
# reference DnCNN-320x10 recipe (train_JPEG.json: patch 256, batch 16,
# QF 5-50, wgan-gp, D_verification=initial_gradual with the lax
# min_mean_D_correct=0.1) for several thousand on-chip steps, crossing
# the JPEG D-verification gate, then eval tables at QF 10/30/50 vs the
# plain JPEG decode.  ONE TPU job at a time — run after the flagship run.
set -e
cd /root/repo
EXP=experiments/run_jpeg_r5
COMMON="--data_dir experiments/data/train --val_dir experiments/data/val \
  --patch 256 --batch 16 --nf 320 --nb 10 --latent_channels 64 \
  --qf_min 5 --qf_max 50 --exp_dir $EXP --val_freq 500 --ckpt_freq 500 \
  --print_freq 100"
NITER=${1:-8000}

echo "=== train to $NITER $(date)"
python -m exsr.apps.train_jpeg $COMMON --niter $NITER
echo "=== eval QF 10/30/50 $(date)"
for QF in 10 30 50; do
  python -m exsr.apps.eval_jpeg --data_dir experiments/data/val --qf $QF \
    --nf 320 --nb 10 --latent_channels 64 --checkpoint $EXP/ckpt \
    --out_dir $EXP/eval_qf$QF --num_z 3
done
echo "=== done $(date)"
