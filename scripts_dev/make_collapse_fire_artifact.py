"""Assemble artifacts/collapse_fire_r5 from the collapse-guard LIVE-FIRE
run (VERDICT-r4 next #4): a fork of the r5 flagship run's final
checkpoint resumed with lr_D jumped 30x (1e-5 -> 3e-4) under an ARMED
--collapse_guard — the same provocation that produced the r4 recorded
symmetric critic runaway the reference's D-loss-STD detector is provably
blind to (the original r4 diverged-checkpoint staging was destroyed by a
VM reset) — capturing the full fire -> restore-before-step -> LR-halve
-> recovery arc, or the honest negative if nothing fires in the cap.

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
    fork_path = os.path.join(exp, 'fork_step.txt')
    fork = int(open(fork_path).read()) if os.path.exists(fork_path) else 0
    lo = max(0, fork - 500)
    out = {
        'what': __doc__.split('\n\n')[0].replace('\n', ' '),
        'staged_from': (
            open(os.path.join(exp, 'staged_from.txt')).read().strip()
            if os.path.exists(os.path.join(exp, 'staged_from.txt'))
            else f'run_flagship_r5 ckpt step {fork} (nb=23 nf=64 '
                 'FC-head D), lr_D jumped 1e-5 -> 3e-4'),
        'fired': bool(fires),
        'fire_lines': fires,
        'rollback_lines': rollbacks,
        'rollback_events': rb,
        'rollback_steps': fire_steps,
        'D_logits_diff': series('D_logits_diff', 5, lo),
        'l_d_total': series('l_d_total', 4, lo),
        'D_loss_STD': series('D_loss_STD', 4, lo),
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
