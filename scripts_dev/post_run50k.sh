#!/bin/bash
# After scripts_dev/run50k2.sh completes: assemble the r4 training
# artifact and the trained-model eval table (VERDICT-r3 #3 Done criteria).
set -e
cd /root/repo
echo "=== traincurve artifact $(date)"
python scripts_dev/make_traincurve_r4.py
echo "=== export_g $(date)"
python -m exsr.apps.scripts export_g --train_ckpt experiments/run50k2/ckpt \
    --out experiments/run50k2/g_export
echo "=== eval table (Z=0 + diversity sweep) $(date)"
python -m exsr.apps.eval_sr --opt experiments/run50k2/opt.json \
    --hr_dir experiments/data/val --checkpoint experiments/run50k2/g_export \
    --num_z 5 --out_dir artifacts/run50k_r4/eval --save_images
echo "=== eval table (uniform sweep Z in {-1,0,1}) $(date)"
python -m exsr.apps.eval_sr --opt experiments/run50k2/opt.json \
    --hr_dir experiments/data/val --checkpoint experiments/run50k2/g_export \
    --latent uniform_sweep --num_z 3 --out_dir artifacts/run50k_r4/eval_sweep
echo "=== done $(date)"
