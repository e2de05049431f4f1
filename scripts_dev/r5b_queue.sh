#!/bin/bash
# Round-5 (session 2) post-flagship TPU queue — run STRICTLY SEQUENTIALLY
# (one TPU job at a time, verify-skill rule) after the flagship trainer
# has been SIGINT'd at the deadline step:
#   1. post_flagship_r5.sh — export_g -> eval tables -> TRAINCURVE_r05
#      (+ the conv-layout probe PERF.md's lever table cites)
#   2. bench_edit.py -> BENCH_EDIT_r05.json (best-of-3 per point)
#   3. probe_serve_pad.py -> the V5E_MS_PER_FWD serving-table numbers
#   4. make_estkernel_e2e.py -> artifacts/estkernel_e2e_r5 (flagship G)
#   5. JPEG long run, time-capped to leave the chip free for the
#      end-of-round driver bench, then QF 10/30/50 evals + artifact.
# Overall deadline (epoch seconds) in experiments/r5b_deadline; the JPEG
# trainer gets whatever remains minus ~12 min for its evals.
set -x
cd /root/repo
DEADLINE=$(cat experiments/r5b_deadline 2>/dev/null || echo $(($(date +%s) + 5400)))

bash scripts_dev/post_flagship_r5.sh > experiments/post_flagship_r5.log 2>&1
echo "=== post_flagship rc=$? $(date)"

python bench_edit.py BENCH_EDIT_r05.json > experiments/bench_edit_r5.log 2>&1
echo "=== bench_edit rc=$? $(date)"

python scripts_dev/probe_serve_pad.py > experiments/serve_pad_r5.log 2>&1
echo "=== serve_pad rc=$? $(date)"

python scripts_dev/make_estkernel_e2e.py > experiments/estkernel_e2e_r5.log 2>&1
echo "=== estkernel rc=$? $(date)"

NOW=$(date +%s)
JPEG_CAP_S=$((DEADLINE - NOW - 720))
if [ "$JPEG_CAP_S" -ge 600 ]; then
  EXP=experiments/run_jpeg_r5
  JCOMMON="--data_dir experiments/data/train --val_dir experiments/data/val \
    --patch 256 --batch 16 --nf 320 --nb 10 --latent_channels 64 \
    --qf_min 5 --qf_max 50 --exp_dir $EXP --val_freq 500 --ckpt_freq 500 \
    --print_freq 100"
  timeout --signal=INT --kill-after=120 "$JPEG_CAP_S" \
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
else
  echo "=== no time left for the JPEG run (cap ${JPEG_CAP_S}s) $(date)"
fi
echo "=== r5b queue done $(date)"
