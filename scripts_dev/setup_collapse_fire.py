"""Stage the collapse-guard LIVE-FIRE experiment (VERDICT-r4 next #4).

The r4 50k-class run's lr_D=1e-4 divergence survives in
experiments/run50k2/ckpt_diverged_lrd1e-4: the step-40000 checkpoint
holds the patch-head critic EARLY in its runaway (D_logits_diff already
pinned ~0, loss magnitudes ~0.16 and beginning the recorded inflation to
~1.1 by 41600).  This script stages a resume of exactly that state under
an ARMED --collapse_guard so the fire -> restore-before-step -> LR-halve
-> recovery arc happens live on the TPU:

  experiments/collapse_fire_r5/
    opt.json   — run50k2's reduced-width config with the DIVERGED run's
                 actual D (patch head: num_2_strides=2, nf=64 — verified
                 against the checkpoint's pseudo_fc0 8x8 head, which is
                 only shape-valid at 2 stride-2 stages) and lr_D=1e-4
    ckpt/40000 — copied from the diverged graveyard
    logs.npz   — run50k2's curves (truncated on resume)

Then (ONE TPU job at a time — after the flagship run):
    python -m exsr.apps.train_sr --opt experiments/collapse_fire_r5/opt.json \
        --hr_dir experiments/data/train --exp_dir experiments/collapse_fire_r5 \
        --resume --collapse_guard --max_keep 8 --ckpt_freq 250 \
        --print_freq 50 --niter 44000
Fresh checkpoints every 250 steps keep the restore-before target alive
(the r4 failure: max_to_keep=3 had pruned it).
"""
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(ROOT, 'experiments/collapse_fire_r5')


def main():
    os.makedirs(os.path.join(EXP, 'ckpt'), exist_ok=True)
    src = os.path.join(ROOT, 'experiments/run50k2')
    # the diverged run's opt (pre-reinit shape): patch-head D
    opt = open(os.path.join(src, 'opt.json')).read()
    opt = opt.replace('"name": "run50k2_r4"', '"name": "collapse_fire_r5"')
    opt = opt.replace('"root": "experiments/run50k2"',
                      '"root": "experiments/collapse_fire_r5"')
    opt = opt.replace('"lr_D": 1e-5', '"lr_D": 1e-4')
    opt = opt.replace(
        '"relativistic": 0, "norm_type": "batch", "n_layers": 10,',
        '"relativistic": 0, "norm_type": "batch", "n_layers": 10, '
        '"num_2_strides": 2,')
    # the r4 runs were trained when train_sr ignored network_G.gc (the
    # RRDB default 32 was always used); now that gc is wired, the opt
    # must state what the checkpoint actually contains
    opt = opt.replace('"gc": 16', '"gc": 32')
    with open(os.path.join(EXP, 'opt.json'), 'w') as f:
        f.write(opt)
    dst = os.path.join(EXP, 'ckpt', '40000')
    if not os.path.exists(dst):
        shutil.copytree(os.path.join(src, 'ckpt_diverged_lrd1e-4', '40000'),
                        dst)
    shutil.copy(os.path.join(src, 'logs.npz'),
                os.path.join(EXP, 'logs.npz'))
    print('staged', EXP)
    print(json.dumps(json.loads(''.join(
        l for l in open(os.path.join(EXP, 'opt.json'))
        if not l.strip().startswith('//')))['network_D']))


if __name__ == '__main__':
    main()
