"""Batch evaluation CLI — the reference's codes/test.py re-designed.

Computes, per test image: SR at Z=0 (PSNR/SSIM vs GT, border-cropped),
LR-consistency (null-space projection residual), and per-pixel STD across a
sweep of Z samples (diversity) — test.py:140-319.

Usage:
  python -m exsr.apps.eval_sr --hr_dir DIR [--lr_dir DIR] --scale 4 \
      [--checkpoint CKPT] [--num_z 1] [--out_dir results] [--save_images]

Without a checkpoint the generator runs with seeded random weights (useful
for pipeline checks; PSNR then reflects the CEM's analytic low-frequency
reconstruction only).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_model(scale: int, nb: int = 23, latent_channels: int = 3,
                checkpoint: str | None = None,
                upscale_kernel=None):
    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet

    cem = CEM.create(CEMConf(scale_factor=scale),
                     upscale_kernel=upscale_kernel)
    filt = cem.device_filters(3)
    g = RRDBNet(nb=nb, upscale=scale, latent_channels=latent_channels)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, 16, 3)),
                    jnp.zeros((1, 16 * scale, 16 * scale, 3))
                    if latent_channels else None)
    if checkpoint:
        from exsr.train.checkpoints import CheckpointManager
        mgr = CheckpointManager(os.path.abspath(checkpoint))
        state = mgr.restore({'g_params': params})
        params = state['g_params']
    wrapped = cem_wrap(lambda p, x, z: g.apply(p, x, z), filt, upscale=scale)

    def forward(lr_img: np.ndarray, z_hr: np.ndarray):
        out = wrapped(params, jnp.asarray(lr_img), jnp.asarray(z_hr),
                      cem.invalidity_margins_lr, pre_pad=True)
        return np.asarray(jnp.clip(out, 0.0, 1.0))

    return cem, forward


def main(argv=None):
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--hr_dir', help='ground-truth HR image dir')
    p.add_argument('--lr_dir', help='LR dir (default: synthesize from HR)')
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--nb', type=int, default=23)
    p.add_argument('--checkpoint')
    p.add_argument('--num_z', type=int, default=1,
                   help='Z samples for the diversity sweep')
    p.add_argument('--out_dir', default='results')
    p.add_argument('--save_images', action='store_true')
    p.add_argument('--save_std_map', action='store_true',
                   help='with --save_images and num_z>1, also save the '
                        'normalized per-pixel diversity heatmap')
    p.add_argument('--max_images', type=int, default=None)
    p.add_argument('--z_sweep_gif', type=int, default=0, metavar='N',
                   help='export an N-frame GIF sweeping one Z channel '
                        'from -1 to 1 per image (test.py:289-319)')
    p.add_argument('--kernel', choices=['bicubic', 'estimated'],
                   default='bicubic',
                   help="'estimated' runs KernelGAN per image and rebuilds "
                        'the CEM with the estimated kernel '
                        '(test.py:143-148)')
    p.add_argument('--kernelgan_iters', type=int, default=3000)
    p.add_argument('--opt', help='reference-style test options JSON '
                                 '(test_sr.json dialect) — fills '
                                 'scale/nb/data roots; explicit flags win')
    args = p.parse_args(argv)
    if args.opt:
        from exsr.options.config import parse as parse_opt
        opt = parse_opt(args.opt, is_train=False)
        given = set()
        for a in (argv if argv is not None else __import__('sys').argv[1:]):
            if a.startswith('--'):
                given.add(a[2:].split('=')[0])
        if 'scale' not in given and opt['scale']:
            args.scale = int(opt['scale'])
        if 'nb' not in given and opt['network_G'] \
                and opt['network_G']['nb']:
            args.nb = int(opt['network_G']['nb'])
        if not args.hr_dir and not args.lr_dir and opt['datasets']:
            first = next(iter(opt['datasets'].values()))
            args.hr_dir = first.get('dataroot_HR')
            args.lr_dir = first.get('dataroot_LR')

    from exsr.data.datasets import LRHRDataset, LRDataset
    from exsr.utils.metrics import (calculate_psnr, calculate_ssim,
                                    crop_border)
    from exsr.utils.color import tensor2img
    from exsr.ops.resize import imresize

    cem, forward = build_model(args.scale, args.nb,
                               checkpoint=args.checkpoint)
    kernel_estimator = None
    if args.kernel == 'estimated':
        from exsr.kernelgan.kernelgan import (KernelGAN, KernelGANConfig,
                                              analytic_x4_kernel)

        def kernel_estimator(lr_img):
            kg = KernelGAN(KernelGANConfig(
                max_iters=args.kernelgan_iters))
            k2 = kg.estimate(lr_img)
            return analytic_x4_kernel(k2) if args.scale == 4 else k2

    if args.hr_dir:
        ds = LRHRDataset(hr_root=args.hr_dir, lr_root=args.lr_dir,
                         scale=args.scale, train=False, patch_size=None)
    else:
        assert args.lr_dir, 'need --hr_dir or --lr_dir'
        ds = LRDataset(args.lr_dir)
    os.makedirs(args.out_dir, exist_ok=True)

    results = []
    n = len(ds) if args.max_images is None else min(len(ds), args.max_images)
    for i in range(n):
        item = ds[i]
        lr = item['lr'][None]
        name = os.path.splitext(os.path.basename(item['path']))[0]
        fwd = forward
        cem_i = cem
        if kernel_estimator is not None:
            # per-image blind kernel -> rebuild the CEM around it
            # (the reference re-creates the model per image,
            # test.py:143-148)
            est = kernel_estimator(item['lr'])
            cem_i, fwd = build_model(args.scale, args.nb,
                                     checkpoint=args.checkpoint,
                                     upscale_kernel=est)
        t0 = time.time()
        zs = [np.zeros((1, lr.shape[1] * args.scale,
                        lr.shape[2] * args.scale, 3), np.float32)]
        rng = np.random.default_rng(i)
        for _ in range(args.num_z - 1):
            zs.append(rng.uniform(-1, 1, size=zs[0].shape)
                      .astype(np.float32))
        # one batched forward over the Z sweep: v5e convs get markedly
        # more efficient with rows, so the diversity sweep is cheaper as
        # one batch-num_z call than num_z sequential batch-1 calls
        batched = fwd(np.repeat(lr, len(zs), 0), np.concatenate(zs, 0))
        outs = [batched[j:j + 1] for j in range(len(zs))]
        dt = time.time() - t0
        sr0 = tensor2img(outs[0])
        rec = {'name': name, 'time_s': dt}
        if 'hr' in item:
            gt = tensor2img(item['hr'][None])
            b = args.scale
            rec['psnr'] = calculate_psnr(
                crop_border(sr0.astype(np.float64), b),
                crop_border(gt.astype(np.float64), b))
            rec['ssim'] = calculate_ssim(
                crop_border(sr0.astype(np.float64), b),
                crop_border(gt.astype(np.float64), b))
        # LR-consistency: downscale(SR) vs LR input (test.py:218-236)
        down = imresize(outs[0][0].astype(np.float64), 1.0 / args.scale)
        # the guarantee only holds inside the invalidity margins; clamp so
        # tiny images (interior smaller than the margins) keep >=1 px
        # instead of producing a mean over an empty slice
        m = max(int(cem_i.invalidity_margins_lr), 1)
        m = min(m, (min(down.shape[0], down.shape[1]) - 1) // 2)
        m = max(m, 1)
        if down.shape[0] > 2 * m and down.shape[1] > 2 * m:
            rec['consistency_mae'] = float(
                np.mean(np.abs(down - item['lr'])[m:-m, m:-m]))
        # else: LR too small for any interior pixel after the margin
        # crop — the guarantee has no valid region to measure, so the
        # metric is omitted rather than reported as a NaN mean
        if args.num_z > 1:
            stack = np.stack([o[0] for o in outs])
            rec['per_pixel_std'] = float(stack.std(axis=0).mean())
        results.append(rec)
        if args.save_images:
            from PIL import Image
            Image.fromarray(sr0).save(
                os.path.join(args.out_dir, f'{name}_SR.png'))
            if args.num_z > 1 and args.save_std_map:
                # normalized per-pixel diversity heatmap across the
                # sampled Zs (visual counterpart of per_pixel_std)
                sm = stack.std(axis=0).mean(-1)
                sm = sm / max(float(sm.max()), 1e-12)
                Image.fromarray(
                    (sm * 255).round().astype('uint8')).save(
                    os.path.join(args.out_dir, f'{name}_STDmap.png'))
        if args.z_sweep_gif > 1:
            # sweep channel 0 of Z from -1 to 1 (test.py:289-319)
            from PIL import Image
            frames = []
            for v in np.linspace(-1.0, 1.0, args.z_sweep_gif):
                z = np.zeros_like(zs[0])
                z[..., 0] = v
                frames.append(Image.fromarray(tensor2img(fwd(lr, z))))
            frames[0].save(
                os.path.join(args.out_dir, f'{name}_Zsweep.gif'),
                save_all=True, append_images=frames[1:], duration=150,
                loop=0)
        print(json.dumps(rec))

    summary = {'num_images': len(results)}
    for key in ('psnr', 'ssim', 'consistency_mae', 'per_pixel_std'):
        vals = [r[key] for r in results if key in r]
        if vals:
            summary[f'avg_{key}'] = float(np.mean(vals))
    with open(os.path.join(args.out_dir, 'summary.json'), 'w') as f:
        json.dump({'summary': summary, 'per_image': results}, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == '__main__':
    main()
