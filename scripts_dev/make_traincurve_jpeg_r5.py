"""Assemble TRAINCURVE_JPEG_r05.json + artifacts/run_jpeg_r5 from the
JPEG twin's long run (VERDICT-r4 next #6): train_jpeg at the reference
DnCNN-320x10 recipe (train_JPEG.json: patch 256, batch 16, QF 5-50,
wgan-gp, D_verification=initial_gradual with the lax
min_mean_D_correct=0.1) for the deadline-capped on-chip step count,
crossing the JPEG D-verification gate, plus the QF 10/30/50 eval tables
vs the plain JPEG decode.

Run after scripts_dev/r5_tail.sh's JPEG stage:
    python scripts_dev/make_traincurve_jpeg_r5.py
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
        return [p for i, p in enumerate(pts)
                if i in (0, len(pts) - 1) or p[1] != pts[i - 1][1]]
    return pts[::every] if every > 1 else pts


def main():
    exp = os.path.join(ROOT, 'experiments/run_jpeg_r5')
    art = os.path.join(ROOT, 'artifacts/run_jpeg_r5')
    os.makedirs(art, exist_ok=True)
    d = np.load(os.path.join(exp, 'logs.npz'), allow_pickle=True)
    shutil.copy(os.path.join(exp, 'logs.npz'), art)
    for sub in os.listdir(exp):
        if sub.startswith('eval_qf'):
            shutil.copytree(os.path.join(exp, sub),
                            os.path.join(art, sub), dirs_exist_ok=True)

    gate_open = (int(d['l_g_gan'][0][0])
                 if 'l_g_gan' in d.files and len(d['l_g_gan']) else None)
    final_step = max(int(d[k][-1][0]) for k in d.files if len(d[k]))
    out = {
        'what': ('VERDICT-r4 next #6: the JPEG twin\'s long run — '
                 'train_jpeg at the reference DnCNN-320x10 recipe '
                 '(train_JPEG.json:11-19: patch 256, batch 16, QF 5-50, '
                 'wgan-gp, D_verification=initial_gradual with '
                 'min_mean_D_correct=0.1, :93,:96) on the real TPU v5e, '
                 'crossing the JPEG D-verification gate, with QF '
                 '10/30/50 eval tables vs the plain JPEG decode '
                 '(eval_qf*/summary.json: avg_psnr_jpeg is the plain '
                 'decode, avg_psnr_decomp the explorable model at Z=0, '
                 'avg_per_pixel_std the random-Z diversity).'),
        'final_step': final_step,
        'gate_opened_step': gate_open,
        'd_verification': 'initial_gradual',
        'min_mean_d_correct': 0.1,
        'val_psnr': series(d, 'psnr_val', dedupe=True),
        'val_per_pix_STD': series(d, 'per_pix_STD_val', 6, dedupe=True),
        'D_correct': series(d, 'Correctly_distinguished', 4, every=5),
        'D_logits_diff': series(d, 'D_logits_diff', 4, every=5),
        'l_d_total': series(d, 'l_d_total', 4, every=5),
        'l_g_gan': series(d, 'l_g_gan', 4, every=5),
        'steps_per_s': (round(float(np.median(
            [v for _, v in d['steps_per_s']])), 3)
            if 'steps_per_s' in d.files else None),
        'eval': {},
    }
    for qf in (10, 30, 50):
        p = os.path.join(exp, f'eval_qf{qf}', 'summary.json')
        if os.path.exists(p):
            out['eval'][f'qf{qf}'] = json.load(open(p))['summary']
    with open(os.path.join(art, 'summary.json'), 'w') as f:
        json.dump(out, f, indent=1)
    slim = {k: v for k, v in out.items()
            if k not in ('D_correct', 'D_logits_diff', 'l_d_total',
                         'l_g_gan')}
    slim['full_series'] = 'artifacts/run_jpeg_r5/summary.json + logs.npz'
    with open(os.path.join(ROOT, 'TRAINCURVE_JPEG_r05.json'), 'w') as f:
        json.dump(slim, f, indent=1)
    print('final step', final_step, 'gate', gate_open,
          'evals', sorted(out['eval']))


if __name__ == '__main__':
    sys.exit(main())
