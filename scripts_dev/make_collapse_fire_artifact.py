"""Assemble artifacts/collapse_fire_r5 from the collapse-guard LIVE-FIRE
run (VERDICT-r4 next #4): the staged resume of the r4 lr_D=1e-4 diverged
state (experiments/collapse_fire_r5, step-40000 checkpoint of the
symmetric critic runaway the reference's D-loss-STD detector is provably
blind to) under an ARMED --collapse_guard, capturing the full
fire -> restore-before-step -> LR-halve -> recovery arc.

Run after the r5_tail.sh collapse-fire stage:
    python scripts_dev/make_collapse_fire_artifact.py
"""
import json
import os
import re
import shutil
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    exp = os.path.join(ROOT, 'experiments/collapse_fire_r5')
    art = os.path.join(ROOT, 'artifacts/collapse_fire_r5')
    os.makedirs(art, exist_ok=True)
    d = np.load(os.path.join(exp, 'logs.npz'), allow_pickle=True)
    shutil.copy(os.path.join(exp, 'logs.npz'), art)
    shutil.copy(os.path.join(exp, 'opt.json'), art)

    log_lines = open(os.path.join(exp, 'run.log')).read().splitlines()
    fires = [ln for ln in log_lines if 'critic collapse detected' in ln]
    rollbacks = [ln for ln in log_lines if 'instability rollback' in ln]
    # keep the human-readable fire/rollback/recovery excerpt
    keep = [ln for ln in log_lines
            if ('collapse' in ln or 'rollback' in ln
                or not ln.startswith('{'))]
    with open(os.path.join(art, 'run_excerpt.log'), 'w') as f:
        f.write('\n'.join(keep) + '\n')

    def series(k, rnd=4, lo=None, hi=None):
        if k not in d.files:
            return []
        pts = [[int(s), round(float(v), rnd)] for s, v in d[k]]
        if lo is not None:
            pts = [p for p in pts if lo <= p[0] <= (hi or 10**9)]
        return pts

    rb = series('rollback_lr_scale', 6)
    fire_steps = [int(m.group(1)) for ln in rollbacks
                  for m in [re.search(r'rollback to step (\d+)', ln)]
                  if m]
    # the window around the staged divergence (resume at 40000; the r4
    # recorded runaway inflated |l_d| 0.39 -> 1.2 by ~41600)
    out = {
        'what': __doc__.split('\n\n')[0].replace('\n', ' '),
        'staged_from': 'run50k2 ckpt_diverged_lrd1e-4 step 40000, '
                       'lr_D=1e-4, patch-head D (num_2_strides=2)',
        'fired': bool(fires),
        'fire_lines': fires,
        'rollback_lines': rollbacks,
        'rollback_events': rb,
        'rollback_steps': fire_steps,
        'D_logits_diff': series('D_logits_diff', 5, 39500),
        'l_d_total': series('l_d_total', 4, 39500),
        'D_loss_STD': series('D_loss_STD', 4, 39500),
        'post_fire_recovery': None,
    }
    if fire_steps:
        t = fire_steps[-1]
        mags = [p for p in series('l_d_total', 4, t)
                if p[0] > t]
        if mags:
            out['post_fire_recovery'] = {
                'steps_after_restore': len(mags),
                'abs_l_d_total_median_after': round(float(np.median(
                    [abs(v) for _, v in mags])), 4),
            }
    with open(os.path.join(art, 'summary.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print('fired:', out['fired'], 'rollback steps:', fire_steps)


if __name__ == '__main__':
    sys.exit(main())
