#!/bin/bash
# Round-5 continuation: EXTEND the JPEG twin's long run (VERDICT-r4 #6).
# The r5c deadline cap gave the committed run only 689 s of chip time ->
# 50 steps, and the QF eval tables were computed from the step-1
# checkpoint (the only one that survived the SIGINT).  Resume the same
# experiment at the same reference recipe for the seconds passed in $1,
# then re-run the QF 10/30/50 evals from the LATEST checkpoint, rebuild
# TRAINCURVE_JPEG_r05.json, and auto-commit.  ONE TPU job at a time.
set -x
cd /root/repo
EXP=experiments/run_jpeg_r5
TRAIN_SECS=${1:-3600}
COMMON="--data_dir experiments/data/train --val_dir experiments/data/val \
  --patch 256 --batch 16 --nf 320 --nb 10 --latent_channels 64 \
  --qf_min 5 --qf_max 50 --exp_dir $EXP --val_freq 100 --ckpt_freq 100 \
  --print_freq 20"

echo "=== jpeg resume for ${TRAIN_SECS}s $(date)"
timeout --signal=INT --kill-after=240 "$TRAIN_SECS" \
  python -m exsr.apps.train_jpeg $COMMON --resume --niter 2000000
echo "=== jpeg train rc=$? $(date)"

for QF in 10 30 50; do
  python -m exsr.apps.eval_jpeg --data_dir experiments/data/val --qf $QF \
    --nf 320 --nb 10 --latent_channels 64 --checkpoint $EXP/ckpt \
    --out_dir $EXP/eval_qf$QF --num_z 3
done
echo "=== jpeg evals rc=$? $(date)"

python scripts_dev/make_traincurve_jpeg_r5.py
git add TRAINCURVE_JPEG_r05.json artifacts/run_jpeg_r5
git commit -m "Extend the JPEG long run past the r5c deadline cap: resume train_jpeg at the reference DnCNN-320x10 recipe on the real TPU (the committed run had only 50 steps and its QF eval tables came from the step-1 checkpoint), re-eval QF 10/30/50 from the latest checkpoint, rebuild TRAINCURVE_JPEG_r05.json"
echo "=== r5d jpeg done $(date)"
