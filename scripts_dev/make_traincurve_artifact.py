"""Regenerate TRAINCURVE_r03.json + artifacts/convergence_r3 from the
experiment logs (run after extending the on-TPU convergence runs)."""
import json
import os
import shutil
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def series(d, k, rnd=3):
    return [[int(s), round(float(v), rnd)] for s, v in d[k]] \
        if k in d.files else []


def main():
    exp = os.path.join(ROOT, 'experiments/convergence_r3')
    art = os.path.join(ROOT, 'artifacts/convergence_r3')
    d = np.load(os.path.join(exp, 'logs.npz'), allow_pickle=True)
    shutil.copy(os.path.join(exp, 'logs.npz'), art)
    if os.path.isdir(os.path.join(exp, 'dashboards')):
        shutil.copytree(os.path.join(exp, 'dashboards'),
                        os.path.join(art, 'dashboards'),
                        dirs_exist_ok=True)
    gate_open = (int(d['l_g_gan'][0][0])
                 if 'l_g_gan' in d.files and len(d['l_g_gan']) else None)
    out = {
        'what': ('SR training convergence on the real TPU v5e at the '
                 'flagship config (23-block G, VGG-128 D, HR 208, batch '
                 '16) via the train_sr CLI: 700-step init phase '
                 '(pixel+range, the zero-egress ESRGAN-warm-start '
                 'stand-in), then a wgan-gp GAN phase at the reference '
                 'lr 1e-5 extended to the final step below'),
        'val_psnr': series(d, 'psnr_val'),
        'val_per_pixel_std': series(d, 'per_pix_STD_val', 6),
        'd_metrics_tail': {
            'D_logits_diff': series(d, 'D_logits_diff', 4)[-10:],
            'Correctly_distinguished':
                series(d, 'Correctly_distinguished', 3)[-10:],
            'l_d_total': series(d, 'l_d_total', 4)[-10:],
        },
        'g_gan_phase': {
            'gate_opened_step': gate_open,
            'l_g_gan': series(d, 'l_g_gan', 4),
            'l_g_total': series(d, 'l_g_total', 4),
        },
        'gan_gate_reading': (
            'the D-verification gate (10 consecutive steps with '
            'logits-diff > log(1.05) and correct > 0.9, '
            'SRRaGAN_model.py:379-382 semantics) OPENED at the step '
            'recorded in g_gan_phase.gate_opened_step after ~1800 '
            'D-only wgan-gp steps at the reference lr 1e-5 — from then '
            'on G takes adversarial steps (l_g_gan series). The first '
            'compile of the adversarial G step exceeded single-chip '
            'HBM at batch 16 (17.2 vs 15.75 GB); --accum_g 2 '
            '(bit-equivalent virtual-batch microbatching) fits it. '
            'Val PSNR easing off its init optimum while l_g_gan '
            'falls is the expected perception-distortion tradeoff.'),
        'trained_eval': 'see eval_trained_step850.json (export_g -> '
                        'eval_sr chain)',
    }
    with open(os.path.join(art, 'summary_extended.json'), 'w') as f:
        json.dump(out, f, indent=1)
    tc = os.path.join(ROOT, 'TRAINCURVE_r03.json')
    with open(tc) as f:
        cur = json.load(f)
    cur['gan_phase_extension'] = {
        'final_step': int(d['l_d_total'][-1][0]),
        'gate_opened_step': gate_open,
        'note': out['gan_gate_reading'],
    }
    cur['jpeg_convergence'] = 'artifacts/convergence_jpeg_r3/summary.json'
    with open(tc, 'w') as f:
        json.dump(cur, f, indent=1)
    print('artifacts updated; final step',
          int(d['l_d_total'][-1][0]))


if __name__ == '__main__':
    sys.exit(main())
