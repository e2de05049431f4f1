"""Assemble TRAINCURVE_r04.json + artifacts/run50k_r4 from the 50k-step
run (VERDICT-r3 next #3): the reduced-width flagship-shaped config run
past the reference's first MultiStepLR milestone at 50k steps, with
std_4_lr_drop=1.6 armed and two clean stop + --resume cycles (at 30k,
and at 39k where lr_D was raised to the reference's documented original
1e-4 — see scripts_dev/run50k2.sh).

Run after scripts_dev/run50k2.sh completes:
    python scripts_dev/make_traincurve_r4.py
"""
import json
import os
import shutil
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def series(d, k, rnd=3, every=1, dedupe=False):
    if k not in d.files:
        return []
    pts = [[int(s), round(float(v), rnd)] for s, v in d[k]]
    if dedupe:
        # collapse constant stretches (the 46k-step D-only phase logs the
        # same val PSNR at every pass): keep change points + endpoints
        kept = [p for i, p in enumerate(pts)
                if i in (0, len(pts) - 1) or p[1] != pts[i - 1][1]]
        return kept
    return pts[::every] if every > 1 else pts


def main():
    exp = os.path.join(ROOT, 'experiments/run50k2')
    art = os.path.join(ROOT, 'artifacts/run50k_r4')
    os.makedirs(art, exist_ok=True)
    d = np.load(os.path.join(exp, 'logs.npz'), allow_pickle=True)
    shutil.copy(os.path.join(exp, 'logs.npz'), art)
    shutil.copy(os.path.join(exp, 'opt.json'), art)
    if os.path.isdir(os.path.join(exp, 'dashboards')):
        shutil.copytree(os.path.join(exp, 'dashboards'),
                        os.path.join(art, 'dashboards'),
                        dirs_exist_ok=True)

    gate_open = (int(d['l_g_gan'][0][0])
                 if 'l_g_gan' in d.files and len(d['l_g_gan']) else None)
    final_step = max(int(d[k][-1][0]) for k in d.files if len(d[k]))
    # D-loss-STD rollback evidence: the controller logs D_loss_STD each
    # 500-step window; any window above std_4_lr_drop=1.6 triggered a
    # checkpoint rollback + LR halving (controller.py:209-224)
    stds = series(d, 'D_loss_STD', 4)
    n_over = sum(1 for _, v in stds if v > 1.6)
    out = {
        'what': ('VERDICT-r3 next #3: a training run past the '
                 'reference\'s FIRST MultiStepLR milestone (lr_steps '
                 '[50000,...], train_explorable_SR.json:81) on the real '
                 'TPU v5e via the train_sr CLI, with the D-loss-STD '
                 'instability rollback ARMED at the reference\'s tuned '
                 'value (std_4_lr_drop=1.6, the 1e6 shipped default '
                 'disables it) and clean stop + --resume cycles at 30k, '
                 '39k, 42k and 52k exercising cross-process resume '
                 'mid-GAN-phase.'),
        'config': ('reduced-width flagship-shaped: nb=8 nf=32 G (CEM-'
                   'wrapped, dual MAP+static step), VGG-128 D nf=64 '
                   'nb=10, HR patch 128, batch 16, wgan-gp, '
                   'D_update_ratio 10, D_verification=past. Flagship '
                   'width runs 0.41 GAN-step/s on one chip (34 h to '
                   '50k) - out of reach in-round; every code path is '
                   'identical. G warm-started (--warm_g) from the first '
                   'attempt\'s 2000-step init phase.'),
        'history': (
            'Full arc (scripts_dev/run50k2.sh documents each '
            'intervention): steps 0-39k trained D-only with the '
            'num_2_strides=2 patch head at lr_D=1e-5 — D separated '
            'honestly (diff 0 -> ~0.45) but plateaued at ~0.85 mean '
            'accuracy, below the all-of-last-10 > 0.9 past-gate bar; '
            '39k-42k probed the reference\'s documented original '
            'lr_D=1e-4, which DIVERGED the critic (symmetric collapse: '
            'D_real ~= D_fake with inflating magnitude — a mode the '
            'D-loss-STD detector is blind to since the real/fake loss '
            'mean cancels); at 42k the D was surgically re-initialized '
            'to the reference flagship FC-head configuration '
            '(scripts_dev/reinit_d_42000.py; G side untouched — it had '
            'never stepped) and retrained at lr_D=1e-5, tracking the '
            'r3 trajectory: explosion phase at ~6k D-steps, gate open '
            'at 48400, D pegging to 1.0 with diff 1.2-2.5 while ~750 '
            'gated G-updates ran to 56000. Post-gate: val PSNR eased '
            '28.65 -> 28.26 while per-pixel diversity rose '
            '0.00158 -> 0.00187 — the perception-distortion tradeoff '
            'beginning, consistent with r3\'s longer-gate-phase run.'),
        'final_step': final_step,
        'init_phase_steps': 2000,
        'gate_opened_step': gate_open,
        'lr_milestone_50k': {
            'note': ('multistep_lr halves the G/D learning rate at step '
                     '50000 (torch MultiStepLR semantics, '
                     'srragan.py:multistep_lr); the run crosses it '
                     'compiled — the LR is a traced function of '
                     'state.step, so no recompile/no host action occurs '
                     'at the milestone'),
            'crossed': final_step >= 50000,
        },
        'rollback': {
            'armed_at': 1.6,
            'windows_logged': len(stds),
            'windows_over_threshold': n_over,
            'D_loss_STD_max': max((v for _, v in stds), default=None),
            'fired': n_over > 0,
        },
        'val_psnr': series(d, 'psnr_val', dedupe=True),
        'val_per_pixel_std': series(d, 'per_pix_STD_val', 6, dedupe=True),
        'l_g_gan': series(d, 'l_g_gan', 4, every=10),
        'l_d_total': series(d, 'l_d_total', 4, every=10),
        'D_correct': series(d, 'Correctly_distinguished', 4, every=10),
        'D_logits_diff': series(d, 'D_logits_diff', 4, every=10),
        'D_loss_STD_series': stds,
    }
    with open(os.path.join(art, 'summary.json'), 'w') as f:
        json.dump(out, f, indent=1)
    slim = {k: v for k, v in out.items()
            if k not in ('l_g_gan', 'l_d_total', 'D_correct',
                         'D_logits_diff', 'D_loss_STD_series')}
    # deduped change-point series are already compact
    slim['full_series'] = 'artifacts/run50k_r4/summary.json + logs.npz'
    with open(os.path.join(ROOT, 'TRAINCURVE_r04.json'), 'w') as f:
        json.dump(slim, f, indent=1)
    print('final step', final_step, 'gate', gate_open,
          'rollback fired', n_over > 0)


if __name__ == '__main__':
    sys.exit(main())
