#!/bin/bash
# Collapse-guard LIVE FIRE, re-staged (VERDICT-r4 next #4).
#
# The original staging (resume of the r4 run50k2 lr_D=1e-4 diverged
# checkpoint) was destroyed by the VM reset, so the divergence is
# provoked fresh: fork the r5 flagship run at its FINAL checkpoint and
# resume with lr_D jumped 30x (1e-5 -> 3e-4) under an ARMED
# --collapse_guard (plus the reference-semantics D-loss-STD rollback,
# always armed at 1.6).  This replicates the r4 experiment that
# produced the recorded symmetric collapse (a 10x lr_D jump on a
# trained critic; SRRaGAN_model.py:592-632 is the reference trigger
# being extended), but on a critic with real separation and with the
# guard allowed to act.  Whichever trigger fires, the full
# fire -> restore-before-step -> LR-halve -> recovery arc lands in
# experiments/collapse_fire_r5/run.log; if neither fires inside the
# 40-min cap, the artifact records the honest negative.
set -e
cd /root/repo
SRC=experiments/run_flagship_r5
EXP=experiments/collapse_fire_r5
LATEST=$(ls $SRC/ckpt | sort -n | tail -1)
echo "=== staging live fire from flagship step $LATEST $(date)"
rm -rf $EXP
mkdir -p $EXP/ckpt
cp -r $SRC/ckpt/$LATEST $EXP/ckpt/$LATEST
cp $SRC/logs.npz $EXP/
echo "$LATEST" > $EXP/fork_step.txt
python - "$SRC/opt.json" "$EXP/opt.json" <<'EOF'
import sys
opt = open(sys.argv[1]).read()
opt = opt.replace('"name": "run_flagship_r5"', '"name": "collapse_fire_r5"')
opt = opt.replace('"root": "experiments/run_flagship_r5"',
                  '"root": "experiments/collapse_fire_r5"')
assert '"lr_D": 1e-5' in opt
opt = opt.replace('"lr_D": 1e-5', '"lr_D": 3e-4')
open(sys.argv[2], 'w').write(opt)
EOF
# capped (default 40 min, tunable via experiments/r5_livefire_cap);
# clean SIGINT (checkpoint-safe), SIGKILL only if ignored.
CAP=$(cat experiments/r5_livefire_cap 2>/dev/null || echo 2400)
timeout --signal=INT --kill-after=120 "$CAP" \
  python -m exsr.apps.train_sr --opt $EXP/opt.json \
    --hr_dir experiments/data/train --exp_dir $EXP \
    --resume --collapse_guard --max_keep 12 --ckpt_freq 250 \
    --print_freq 25 --niter $((LATEST + 2500)) \
    > $EXP/run.log 2>&1 || true
python scripts_dev/make_collapse_fire_artifact.py
