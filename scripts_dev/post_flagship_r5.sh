#!/bin/bash
# After scripts_dev/run_flagship_r5.sh completes (or is cleanly stopped
# at a checkpoint): export the flagship G and produce the trained-model
# eval tables + the r5 traincurve artifact (VERDICT-r4 next #1 Done
# criteria: TRAINCURVE_r05.json at nb=23/nf=64 with gate state, an
# export_g -> eval_sr PSNR/SSIM/consistency/diversity table, and a
# fired-or-not statement for both guards).
set -e
cd /root/repo
EXP=experiments/run_flagship_r5
echo "=== export_g $(date)"
python -m exsr.apps.scripts export_g --train_ckpt $EXP/ckpt \
    --out $EXP/g_export
echo "=== eval table (Z=0 + diversity sweep) $(date)"
python -m exsr.apps.eval_sr --opt $EXP/opt.json \
    --hr_dir experiments/data/val --checkpoint $EXP/g_export \
    --num_z 5 --out_dir $EXP/eval --save_images --save_std_map
echo "=== eval table (uniform sweep Z in {-1,0,1}) $(date)"
python -m exsr.apps.eval_sr --opt $EXP/opt.json \
    --hr_dir experiments/data/val --checkpoint $EXP/g_export \
    --latent uniform_sweep --num_z 3 --out_dir $EXP/eval_sweep
echo "=== traincurve artifact $(date)"
python scripts_dev/make_traincurve_r5.py
echo "=== layout probe (PERF.md lever table, cheap probe 1) $(date)"
python scripts_dev/probe_layout.py \
    > experiments/probe_layout_r5.log 2>&1 || true
echo "=== done $(date)"
