#!/bin/bash
# VERDICT-r3 next #3, take 2: the long training run. The first attempt
# (run50k.sh) trained D-only for 11k steps with the verification gate
# never opening — root-caused to the reference-faithful patch head
# batch-normalizing the FINAL critic logit (architecture.py:501; see
# scripts_dev/probe_d_learn.py and discriminators.py pseudo_fc1). This
# restart keeps the same reduced-width flagship-shaped config (CEM-wrapped
# RRDB G + dual MAP/static G step, wgan-gp patch-head D now with a clean
# logit, D-verification gating, MultiStepLR [50k,...], std_4_lr_drop=1.6
# armed) and warm-starts the 2000-step init-phase G from the first run
# (G never stepped in its GAN phase, so nothing is lost). A clean stop +
# --resume at 30k exercises cross-process resume on a real run.
set -e
cd /root/repo
OPT=experiments/run50k2/opt.json
DIRS="--hr_dir experiments/data/train --val_hr_dir experiments/data/val"
EXP="--exp_dir experiments/run50k2"
COMMON="--opt $OPT $DIRS $EXP --val_freq 250 --ckpt_freq 1000 --print_freq 100"

echo "=== GAN phase to 30000 $(date)"
python -m exsr.apps.train_sr $COMMON --warm_g experiments/run50k2/g_init --niter 30000
echo "=== resumed GAN phase to 52000 $(date)"
python -m exsr.apps.train_sr $COMMON --niter 52000 --resume
echo "=== done $(date)"

# INTERVENTION 1 at step 39000: with the patch-head D (num_2_strides=2)
# at the config's lr_D=1e-5 the verification gate never opened in 39k
# steps — D separated honestly (D_logits_diff grew 0.0->~0.45, correct
# ~0.85) but the 'past' gate needs ALL of the last 10 D-steps above 0.9
# (=15/16 at batch 16), which a 0.85-mean critic essentially never
# sustains. The reference's own config documents lr_D=1e-4 as the
# original value (train_explorable_SR.json:74 '//1e-4'); opt.json was
# edited to 1e-4 and the run resumed from ckpt 39000.
#
# OUTCOME: the 10x LR jump DIVERGED the critic within ~1k steps —
# D_real ~= D_fake collapsed onto one inflating value (diff ~0, |D| and
# the gradient penalty growing monotonically), a symmetric mode the
# D-loss-STD rollback detector cannot see (std of (l_d_real+l_d_fake)/2
# cancels when the outputs are symmetric; it stayed ~0.005, far below
# the 1.6 trigger). Orbax max_to_keep=3 had pruned ckpt 39000 by
# diagnosis time, so no pre-divergence restore point existed.
#
# INTERVENTION 2 at step 42000 (scripts_dev/reinit_d_42000.py): G never
# stepped in the GAN phase (gate closed throughout), so the G side of
# every checkpoint is identical and clean; the step-42000 checkpoint was
# rebuilt with the restored G side + a FRESH D switched to the
# reference's actual flagship configuration — FC head (default
# num_2_strides=5, architecture.py:447) nf=64 — whose gate demonstrably
# opens at the reference lr_D=1e-5 (r3: gate at step 4300). lr_D
# restored to 1e-5; resumed:
#   python -m exsr.apps.train_sr $COMMON --niter 52000 --resume
#
# OUTCOME: the fresh FC-head D tracked r3's trajectory (accuracy crept
# to ~0.8 by 2k D-steps, then the explosion phase: diff 0.05 -> 1.3 and
# accuracy pegging toward 1.0 around 6.3k D-steps), the verification
# gate OPENED at step ~48400, G-steps began flowing as D firmed, and
# the run crossed the 50000 MultiStepLR milestone mid-G-training (the
# halving is a traced function of state.step — no recompile, no host
# action). EXTENSION to 56000 for a longer post-gate G-training
# segment (~750 G updates):
#   python -m exsr.apps.train_sr $COMMON --niter 56000 --resume
