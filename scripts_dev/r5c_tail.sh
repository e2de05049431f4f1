#!/bin/bash
# Round-5 session-3 TPU queue — STRICTLY SEQUENTIAL (one TPU job at a
# time), auto-committing each artifact as it lands (two VM resets have
# already destroyed uncommitted run state this round).  Stages:
#   0. wait for the serve-pad probe (launched before this script)
#   1. fresh collapse-guard warmup at the r4 divergence's width
#      (init 300 + wgan-gp GAN phase to step 800, guards armed)
#   2. fork with lr_D jumped 100x under the armed guard — the LIVE FIRE
#      (VERDICT-r4 #4), 12-min cap, assembler handles honest negatives
#   3. export the warmup G -> estimated-kernel e2e (VERDICT-r4 #5)
#   4. JPEG long run (VERDICT-r4 #6) capped to the deadline minus the
#      QF-eval + assembly margin, then QF 10/30/50 evals + artifact.
set -x
cd /root/repo
DEADLINE=$(cat experiments/r5c_deadline 2>/dev/null \
  || echo $(($(date +%s) + 5100)))

while kill -0 "$(cat /tmp/serve_pad.pid 2>/dev/null)" 2>/dev/null; do
  sleep 10
done
echo "=== serve probe done $(date)"

# --- 1. warmup -------------------------------------------------------
python scripts_dev/setup_collapse_fresh.py warm
W="--opt experiments/collapse_warm_r5/opt.json \
   --hr_dir experiments/data/train --val_hr_dir experiments/data/val \
   --exp_dir experiments/collapse_warm_r5 --val_freq 250 --ckpt_freq 100 \
   --print_freq 50 --max_keep 12"
python -m exsr.apps.train_sr $W --init_phase --niter 300 \
  > experiments/collapse_warm_init.log 2>&1
echo "=== warm init rc=$? $(date)"
python -m exsr.apps.train_sr $W --resume --collapse_guard --niter 800 \
  > experiments/collapse_warm_gan.log 2>&1
echo "=== warm gan rc=$? $(date)"

# --- 2. live fire ----------------------------------------------------
python scripts_dev/setup_collapse_fresh.py fork
timeout --signal=INT --kill-after=240 720 \
  python -m exsr.apps.train_sr \
  --opt experiments/collapse_fire_r5/opt.json \
  --hr_dir experiments/data/train --exp_dir experiments/collapse_fire_r5 \
  --resume --collapse_guard --ckpt_freq 100 --max_keep 12 \
  --print_freq 20 --niter 4000 \
  > experiments/collapse_fire_r5/run.log 2>&1
echo "=== live fire rc=$? $(date)"
python scripts_dev/make_collapse_fire_artifact.py
git add artifacts/collapse_fire_r5 scripts_dev/make_collapse_fire_artifact.py \
  scripts_dev/setup_collapse_fresh.py scripts_dev/r5c_tail.sh
git commit -m "Collapse-guard live fire (fresh staging at the r4 divergence's width after both prior stagings died in VM resets): lr_D jumped 100x under the armed guard — artifacts/collapse_fire_r5 records the fire/rollback arc (or the honest negative)"

# --- 3. estimated-kernel e2e -----------------------------------------
python -m exsr.apps.scripts export_g \
  --train_ckpt experiments/collapse_warm_r5/ckpt \
  --out experiments/collapse_warm_r5/g_export \
  > experiments/export_warm_r5.log 2>&1
echo "=== export rc=$? $(date)"
ESTK_CKPT=experiments/collapse_warm_r5/g_export ESTK_NB=8 ESTK_NF=32 \
ESTK_PROVENANCE="collapse_warm_r5 800-step warm G (nb=8 nf=32; every \
wider trained export this round was destroyed by VM resets before this \
script could run — init-phase-quality G, val PSNR ~28.5)" \
  python scripts_dev/make_estkernel_e2e.py 2000 \
  > experiments/estkernel_e2e_r5.log 2>&1
echo "=== estkernel rc=$? $(date)"
git add artifacts/estkernel_e2e_r5 scripts_dev/make_estkernel_e2e.py
git commit -m "Estimated-kernel end-to-end artifact (VERDICT-r4 #5): bicubic-assumed vs KernelGAN-estimated vs true-kernel-oracle CEM on known anisotropic degradations — PSNR/SSIM + true-operator consistency per path (artifacts/estkernel_e2e_r5)"

# --- 4. JPEG long run -------------------------------------------------
NOW=$(date +%s)
JPEG_CAP_S=$((DEADLINE - NOW - 780))
if [ "$JPEG_CAP_S" -ge 420 ]; then
  EXP=experiments/run_jpeg_r5
  JCOMMON="--data_dir experiments/data/train --val_dir experiments/data/val \
    --patch 256 --batch 16 --nf 320 --nb 10 --latent_channels 64 \
    --qf_min 5 --qf_max 50 --exp_dir $EXP --val_freq 500 --ckpt_freq 250 \
    --print_freq 50"
  timeout --signal=INT --kill-after=240 "$JPEG_CAP_S" \
    python -m exsr.apps.train_jpeg $JCOMMON --niter 8000 \
    > experiments/run_jpeg_r5.log 2>&1
  echo "=== jpeg train rc=$? $(date)"
  for QF in 10 30 50; do
    python -m exsr.apps.eval_jpeg --data_dir experiments/data/val --qf $QF \
      --nf 320 --nb 10 --latent_channels 64 --checkpoint $EXP/ckpt \
      --out_dir $EXP/eval_qf$QF --num_z 3 \
      >> experiments/run_jpeg_r5.log 2>&1
  done
  python scripts_dev/make_traincurve_jpeg_r5.py \
    >> experiments/run_jpeg_r5.log 2>&1
  echo "=== jpeg evals rc=$? $(date)"
  git add TRAINCURVE_JPEG_r05.json artifacts/
  git commit -m "JPEG twin's long run (VERDICT-r4 #6): train_jpeg at the reference DnCNN-320x10 recipe on the real TPU, deadline-capped, with QF 10/30/50 eval tables vs plain JPEG decode (TRAINCURVE_JPEG_r05.json)"
else
  echo "=== no time left for the JPEG run (cap ${JPEG_CAP_S}s) $(date)"
fi
echo "=== r5c queue done $(date)"
