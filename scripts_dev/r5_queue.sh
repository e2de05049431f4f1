#!/bin/bash
# Round-5 post-flagship TPU queue — run by r5_tail_v4.sh after the
# flagship run stops.  Lives in its own file so it stays editable while
# the watcher runs (bash reads executing scripts incrementally; editing
# a running script corrupts it).  Strictly sequential, one TPU job at a
# time; each artifact is committed the moment it lands (three session/VM
# resets this round: anything uncommitted can vanish).
cd /root/repo

ci() {  # ci <message> <path...> — commit, never fail the queue
  local msg="$1"; shift
  git add -A "$@" 2>/dev/null || true
  git commit -q -m "$msg" || true
}

set -x
bash scripts_dev/post_flagship_r5.sh \
  > experiments/post_flagship_r5.log 2>&1
ci "Flagship post-run artifacts: export_g, eval tables (Z=0 + uniform sweep), TRAINCURVE_r05" \
  TRAINCURVE_r05.json artifacts/run_flagship_r5

python bench_edit.py BENCH_EDIT_r05.json \
  > experiments/bench_edit_r5.log 2>&1
ci "Edit-latency benchmark recapture (best-of-3 per point, b8/b16 amortized rows)" \
  BENCH_EDIT_r05.json

python scripts_dev/probe_serve_pad.py \
  > experiments/serve_pad_r5.log 2>&1 || true
cp experiments/serve_pad_r5.log artifacts/serve_pad_r5.log 2>/dev/null
ci "Serving pad-bucket probe measurements (V5E_MS_PER_FWD calibration data)" \
  artifacts/serve_pad_r5.log

python scripts_dev/make_estkernel_e2e.py \
  > experiments/estkernel_e2e_r5.log 2>&1 || true
ci "Estimated-kernel end-to-end artifact: bicubic-assumed vs KernelGAN-estimated vs oracle CEM with the flagship export" \
  artifacts/estkernel_e2e_r5

if [ -x scripts_dev/live_fire_r5.sh ] \
    && [ ! -e experiments/r5_skip_livefire ]; then
  bash scripts_dev/live_fire_r5.sh > experiments/live_fire_r5.log 2>&1 || true
  ci "Collapse-guard live fire from the flagship fork (lr_D 1e-5 -> 3e-4)" \
    artifacts/collapse_fire_r5
fi

# JPEG long run, deadline-capped so the chip is free for the
# end-of-round bench: clean-SIGINT the trainer at the cap (checkpoints
# every 500 keep the state), then run the QF evals regardless.
DEADLINE=$(cat experiments/r5_jpeg_deadline 2>/dev/null \
  || date -d '23:45 today' +%s)
NOW=$(date +%s)
JPEG_CAP_S=$((DEADLINE - NOW))
[ "$JPEG_CAP_S" -lt 900 ] && JPEG_CAP_S=900
EXP=experiments/run_jpeg_r5
JCOMMON="--data_dir experiments/data/train --val_dir experiments/data/val \
  --patch 256 --batch 16 --nf 320 --nb 10 --latent_channels 64 \
  --qf_min 5 --qf_max 50 --exp_dir $EXP --val_freq 500 --ckpt_freq 500 \
  --print_freq 100"
timeout --signal=INT --kill-after=120 "$JPEG_CAP_S" \
  python -m exsr.apps.train_jpeg $JCOMMON --niter 8000 \
  > experiments/run_jpeg_r5.log 2>&1
for QF in 10 30 50; do
  python -m exsr.apps.eval_jpeg --data_dir experiments/data/val --qf $QF \
    --nf 320 --nb 10 --latent_channels 64 --checkpoint $EXP/ckpt \
    --out_dir $EXP/eval_qf$QF --num_z 3 \
    >> experiments/run_jpeg_r5.log 2>&1
done
python scripts_dev/make_traincurve_jpeg_r5.py \
  >> experiments/run_jpeg_r5.log 2>&1 || true
ci "JPEG long-run artifacts: TRAINCURVE_JPEG_r05 + QF 10/30/50 eval tables" \
  TRAINCURVE_JPEG_r05.json artifacts/run_jpeg_r5
echo "=== r5 queue done $(date)"
