"""Multi-tool exploration showcase with trained weights.

Drives EditSession end-to-end on the TPU with a trained generator
checkpoint and renders one panel per editing pillar (GUI.py tool surface):
SR at Z=0, STD-max vs STD-min exploration of a region, imprinting with
consistency enforcement, a brightness scribble, and an HSV edit — all
LR-consistent by construction. Output: artifacts/showcase_r3/.

Usage:
  python -m exsr.apps.scripts export_g --train_ckpt experiments/convergence_r3/ckpt \
      --out /tmp/g_export
  python scripts_dev/make_showcase.py --g_ckpt /tmp/g_export
"""
import argparse
import os
import sys

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:          # runnable from any cwd
    sys.path.insert(0, ROOT)
FACE = '/root/reference/Samples/face_GT_HR.png'


def save(path, img01):
    Image.fromarray(
        (np.clip(img01, 0, 1) * 255).round().astype('uint8')).save(path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--g_ckpt',
                   help="exported {'g_params'} checkpoint dir "
                        '(omit for random params: CPU smoke mode)')
    p.add_argument('--out', default=os.path.join(ROOT,
                                                 'artifacts/showcase_r3'))
    p.add_argument('--iters', type=int, default=60)
    p.add_argument('--nb', type=int, default=23)
    p.add_argument('--size', type=int, default=276,
                   help='square HR crop of the input image')
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from exsr.apps.session import EditSession
    from exsr.train.checkpoints import CheckpointManager
    from exsr.ops.resize import imresize

    s = EditSession(scale=4, nb=args.nb, time_budget_s=120.0)
    if args.g_ckpt:
        s.load_params(CheckpointManager(
            os.path.abspath(args.g_ckpt)).restore_raw()['g_params'])
    else:
        s.init_random_params(0)

    n = args.size
    hr = np.asarray(Image.open(FACE).convert('RGB'))[:n, :n] / 255.0
    s.open_image(hr.astype(np.float32), is_hr=True)
    H, W = s.region_mask_hr.shape
    panels = {}

    panels['input_bicubic'] = np.clip(
        imresize(s.lr_image[0].astype(np.float64), 4.0), 0, 1)
    panels['sr_z0'] = np.asarray(s.sr[0]).copy()

    # --- STD exploration on the center region (texture diversity) -------
    mask = np.zeros((H, W), np.float32)
    mask[H // 4:3 * H // 4, W // 4:3 * W // 4] = 1.0
    s.set_region(mask)
    s.optimize('max_STD', max_iters=args.iters)
    panels['max_STD'] = np.asarray(s.sr[0]).copy()
    s.undo()
    s.optimize('min_STD', max_iters=args.iters)
    panels['min_STD'] = np.asarray(s.sr[0]).copy()
    s.undo()
    diversity = float(np.abs(panels['max_STD'] - panels['min_STD']).mean())

    # --- imprint: consistency-enforced paste + Z pull -------------------
    imp = np.zeros((36, 36, 3), np.float32)
    imp[:] = panels['sr_z0'][4:40, 4:40].mean((0, 1))   # local base color
    imp[6:30, 6:12] = imp[6:12, 6:30] = imp[16:21, 6:24] = \
        imp[24:30, 6:30] = 0.05                          # letter "E"
    s.imprint(imp, (H - 60, W - 60), optimize_iters=args.iters)
    panels['imprint'] = np.asarray(s.sr[0]).copy()
    s.undo()

    # --- brightness scribble (3-state color-class strokes) --------------
    scr = np.zeros((H, W), np.int32)
    yy, xx = np.mgrid[0:H, 0:W]
    band = np.abs((yy - H // 2) + (xx - W // 2)) < 8    # diagonal band
    scr[band] = 2                                        # brighten class
    s.set_region((scr > 0).astype(np.float32))
    s.optimize('scribble', data={
        'scribble_mask': scr,
        'desired': panels['sr_z0'][None].astype(np.float32),
        'brightness_factor': 0.35}, max_iters=args.iters)
    panels['scribble_brighten'] = np.asarray(s.sr[0]).copy()
    s.undo()

    # --- HSV edit via consistency enforcement ---------------------------
    import colorsys  # noqa: F401 (documented HSV pathway)
    cur = panels['sr_z0'].copy()
    hsv = np.array(Image.fromarray(
        (cur * 255).astype('uint8')).convert('HSV'), np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * 1.6, 0, 255)     # saturation boost
    edited = np.asarray(Image.fromarray(
        hsv.astype('uint8'), 'HSV').convert('RGB'), np.float32) / 255.0
    panels['hsv_saturate'] = s.enforce_hsv_edit(edited)

    order = ['input_bicubic', 'sr_z0', 'max_STD', 'min_STD',
             'imprint', 'scribble_brighten', 'hsv_saturate']
    for k in order:
        save(os.path.join(args.out, f'{k}.png'), panels[k])
    pad = 4
    grid = np.ones((2 * H + 3 * pad, 4 * W + 5 * pad, 3), np.float32)
    for i, k in enumerate(order):
        r, c = divmod(i, 4)
        y = pad + r * (H + pad)
        x = pad + c * (W + pad)
        grid[y:y + H, x:x + W] = panels[k]
    save(os.path.join(args.out, 'showcase_grid.png'), grid)

    import json
    cons = {}
    for k in order[1:]:
        down = imresize(np.asarray(panels[k], np.float64), 0.25)
        m = int(s.cem.invalidity_margins_lr)
        cons[k] = float(np.mean(np.abs(
            down - s.lr_image[0])[m:-m, m:-m]))
    with open(os.path.join(args.out, 'summary.json'), 'w') as f:
        json.dump({'panels': order,
                   'max_vs_min_STD_mean_abs_diff': diversity,
                   'lr_consistency_mae': cons}, f, indent=1)
    print(json.dumps({'diversity': diversity, 'consistency': cons}))


if __name__ == '__main__':
    main()
