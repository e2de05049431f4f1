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
                upscale_kernel=None, arch: str = 'RRDB_net',
                use_cem: bool = True, nf: int = 64):
    """``arch``/``use_cem``/``latent_channels`` follow the reference's
    network_G vocabulary (test_esrgan.json: CEM_arch=0 + latent 0 +
    RRDB_net; test_esrgan_Feat.json: sr_resnet)."""
    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap

    cem = (CEM.create(CEMConf(scale_factor=scale),
                      upscale_kernel=upscale_kernel)
           if use_cem else None)
    nz = latent_channels
    if arch in ('MSRResNet', 'sr_resnet'):
        from exsr.models.classifiers import MSRResNet, SRResNet
        assert nz == 0, f'{arch} has no latent input'
        cls = MSRResNet if arch == 'MSRResNet' else SRResNet
        g = cls(nf=nf, nb=nb, upscale=scale)
        params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        g_apply = lambda p, x, z: g.apply(p, x)
    else:
        from exsr.models.rrdb import RRDBNet
        g = RRDBNet(nb=nb, nf=nf, upscale=scale, latent_channels=nz)
        params = g.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1, 16 * scale, 16 * scale, nz))
                        if nz else None)
        g_apply = lambda p, x, z: g.apply(p, x, z if nz else None)
    if checkpoint:
        from exsr.train.checkpoints import CheckpointManager
        mgr = CheckpointManager(os.path.abspath(checkpoint))
        state = mgr.restore({'g_params': params})
        params = state['g_params']
    if use_cem:
        wrapped = cem_wrap(g_apply, cem.device_filters(3), upscale=scale)

        def forward(lr_img: np.ndarray, z_hr: np.ndarray):
            out = wrapped(params, jnp.asarray(lr_img), jnp.asarray(z_hr),
                          cem.invalidity_margins_lr, pre_pad=True)
            return np.asarray(jnp.clip(out, 0.0, 1.0))
    else:
        def forward(lr_img: np.ndarray, z_hr: np.ndarray):
            out = g_apply(params, jnp.asarray(lr_img), jnp.asarray(z_hr))
            return np.asarray(jnp.clip(out, 0.0, 1.0))

    return cem, forward


#: --latent modes realized by per-image Z-optimization, mapped to the
#: session objective vocabulary (test.py:183-192; 'Un' variants maximize
#: the distance, Z_optimization.py:733-734)
OPTIMIZER_MODES = {
    'desired_im': 'l1', 'undesired_im': 'max_l1',
    'desired_im_vgg': 'VGG', 'undesired_im_vgg': 'max_VGG',
    'desired_im_hist': 'hist',
    'max_std': 'max_STD', 'min_std': 'min_STD',
}


def sweep_values(mode: str, num: int, z_range: float = 1.0) -> list:
    """Symmetric single-channel sweep values including 0
    (test.py:101-113; the Gaussian spacing covers ``z_range`` of the
    probability mass)."""
    if mode == 'uniform_sweep':
        half = list(np.linspace(-z_range, 0.0, int(np.ceil(num / 2))))[:-1]
        return half + [0.0] + [-v for v in half[::-1]]
    from scipy.stats import norm
    optional = np.arange(-2.0, 0.0, 0.001)
    keep = np.argwhere(norm.cdf(optional) >= (1 - z_range) / 2)
    optional = optional[int(keep[0][0]):]
    n_half = int((num - 1) / 2)
    if n_half == 0:       # num <= 2 -> just the 0 sample (test.py:105-113)
        return [0.0]
    half = [float(optional[int(i * len(optional) / n_half)])
            for i in range(n_half)]
    return half + [0.0] + [-v for v in half[::-1]]


def bucketed_sweep(fwd, lr, zs, table=None):
    """One batched forward over the Z sweep, padded to the fastest
    execution bucket.

    v5e convs get markedly more efficient with rows, so the diversity
    sweep is cheaper as one batch-len(zs) call than sequential batch-1
    calls — and the measured forward-time curve is NON-monotonic in batch
    (BENCH_CURVE.json: b64 takes longer in absolute time than b128), so
    intermediate sweep sizes are zero-padded up to the argmin-time bucket
    (exsr.utils.serve.best_bucket) and the pad rows dropped."""
    from exsr.utils.serve import best_bucket, pad_batch
    n = len(zs)
    lr_rep = np.repeat(lr, n, 0)
    z_cat = np.concatenate(zs, 0)
    bucket = best_bucket(n, table)
    if bucket > n:
        (lr_rep, z_cat), _ = pad_batch([lr_rep, z_cat], bucket)
    batched = fwd(lr_rep, z_cat)
    return [batched[j:j + 1] for j in range(n)]


def build_zs(args, hr_hw, rng, nz: int = 3):
    """Z sample list for the non-optimizer latent modes, plus the index of
    the sample used for PSNR/SSIM (the reference scores the swept-value-0
    sample — test.py:238-242)."""
    h, w = hr_hw
    shape = (1, h, w, max(nz, 1))
    if args.latent == 'rand_uniform':
        # spatially-constant per channel, like the reference's
        # [N, 1, C, 1, 1] draw (test.py:117) — the diversity stats
        # measure global latent shifts, not spatial noise
        zs = [np.zeros(shape, np.float32)]
        for _ in range(args.num_z - 1):
            v = rng.uniform(-1, 1, size=(1, 1, 1, shape[-1]))
            zs.append(np.broadcast_to(v, shape).astype(np.float32))
        return zs, 0
    if args.latent in ('uniform_sweep', 'gaussian_sweep'):
        vals = sweep_values(args.latent, args.num_z)
        zs = []
        for v in vals:
            z = np.full(shape, args.other_channels_val, np.float32)
            z[..., args.latent_channel] = v
            zs.append(z)
        return zs, vals.index(0.0)
    if args.latent == 'unit_circle':
        # theta sweep mapped onto channels (1, 2) as (cos, sin)
        # (test.py:126-128 pol2cart)
        assert nz >= 3, 'unit_circle needs a 3-channel latent'
        thetas = np.linspace(0.0, 2 * np.pi * (args.num_z - 1)
                             / max(args.num_z, 1), args.num_z)
        zs = []
        for t in thetas:
            z = np.full(shape, args.other_channels_val, np.float32)
            z[..., 1] = np.cos(t)
            z[..., 2] = np.sin(t)
            zs.append(z)
        return zs, 0
    if args.latent == 'z_image':
        assert args.z_image, '--latent z_image needs --z_image'
        assert nz in (1, 3), \
            'z_image supports 1- or 3-channel latents (test.py:182)'
        from PIL import Image
        from exsr.utils.misc import im_to_z_input
        paths = ([os.path.join(args.z_image, f)
                  for f in sorted(os.listdir(args.z_image))]
                 if os.path.isdir(args.z_image) else [args.z_image])
        zs = [im_to_z_input(
            np.asarray(Image.open(p).convert('RGB'), np.float32) / 255.0,
            (h, w), single_channel=nz == 1)[None] for p in paths]
        return zs, 0
    raise ValueError(args.latent)


def main(argv=None):
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--hr_dir', help='ground-truth HR image dir')
    p.add_argument('--lr_dir', help='LR dir (default: synthesize from HR)')
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--nb', type=int, default=23)
    p.add_argument('--nf', type=int, default=64)
    p.add_argument('--latent_channels', type=int, default=3,
                   help='generator latent (Z) channels; must match the '
                        'checkpoint being evaluated')
    p.add_argument('--checkpoint')
    p.add_argument('--num_z', type=int, default=1,
                   help='Z samples for the diversity sweep')
    p.add_argument('--latent', default='rand_uniform',
                   choices=['rand_uniform', 'uniform_sweep',
                            'gaussian_sweep', 'unit_circle', 'z_image',
                            'desired_im', 'undesired_im', 'desired_im_vgg',
                            'undesired_im_vgg', 'desired_im_hist',
                            'max_std', 'min_std'],
                   help='eval-time latent distribution (test.py:30,86-135):'
                        ' rand_uniform = Z=0 + random samples;'
                        ' uniform_sweep / gaussian_sweep = symmetric sweep'
                        ' of one Z channel; unit_circle = (cos,sin) sweep'
                        ' on channels 1-2; z_image = Z maps from images;'
                        ' desired_im*/max_std/min_std = per-image'
                        ' Z-optimization (test.py:183-192)')
    p.add_argument('--latent_channel', type=int, default=0,
                   help='swept channel for the sweep modes (test.py:41)')
    p.add_argument('--other_channels_val', type=float, default=0.0,
                   help='value of the non-swept channels (test.py:42)')
    p.add_argument('--z_image',
                   help='image file or dir for --latent z_image '
                        '(util.py Convert_Im_2_Zinput:234)')
    p.add_argument('--desired_im',
                   help='desired image for the desired_im* modes; defaults '
                        'to the GT HR (measures how closely the consistent '
                        'manifold can reach it)')
    p.add_argument('--num_z_iters', type=int, default=250,
                   help='Z-optimization iterations for the optimizer '
                        'modes (test.py:32 NUM_Z_ITERS)')
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
    arch, use_cem, nf, nz = 'RRDB_net', True, args.nf, args.latent_channels
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
        # the config's generator architecture: plain ESRGAN / SRResNet
        # variants (test_esrgan.json, test_esrgan_Feat.json) evaluate
        # without CEM wrap and without Z
        g_opt = opt['network_G'] or {}
        arch = g_opt['which_model_G'] or 'RRDB_net'
        cem_flag = g_opt['CEM_arch']
        if cem_flag is None:
            cem_flag = g_opt['DTE_arch']  # pre-rename key
        use_cem = bool(1 if cem_flag is None else cem_flag)
        if 'latent_channels' not in given:
            nz_opt = g_opt['latent_channels']
            if g_opt['latent_input'] == 'None':
                nz_opt = 0
            if nz_opt is not None:
                from exsr.losses.filter_loss import num_latent_channels
                nz = num_latent_channels(nz_opt)
        if g_opt['nf'] and 'nf' not in given:
            nf = int(g_opt['nf'])
    if nz == 0:
        assert args.latent == 'rand_uniform', \
            'latent modes need a latent-input generator'
        args.num_z = 1
    if not use_cem:
        assert args.kernel == 'bicubic', \
            'estimated kernels need the CEM chain'

    from exsr.data.datasets import LRHRDataset, LRDataset
    from exsr.utils.metrics import (calculate_psnr, calculate_ssim,
                                    crop_border)
    from exsr.utils.color import tensor2img
    from exsr.ops.resize import imresize

    opt_objective = OPTIMIZER_MODES.get(args.latent)
    if opt_objective and not args.z_sweep_gif:
        # the EditSession below is the scoring model and nothing needs a
        # generator forward — build only the CEM (skips a redundant full
        # generator init + checkpoint restore)
        from exsr.cem.cem import CEM, CEMConf
        cem, forward = CEM.create(CEMConf(scale_factor=args.scale)), None
    else:
        cem, forward = build_model(args.scale, args.nb,
                                   latent_channels=nz,
                                   checkpoint=args.checkpoint,
                                   arch=arch, use_cem=use_cem, nf=nf)
    session = None
    if opt_objective:
        assert args.kernel != 'estimated', \
            'optimizer latent modes use the bicubic CEM'
        assert use_cem and arch == 'RRDB_net', \
            'optimizer latent modes need the CEM-wrapped explorable ' \
            'RRDB generator'
        from exsr.apps.session import EditSession
        session = EditSession(scale=args.scale, nb=args.nb, nf=nf,
                              latent_channels=nz)
        session.init_random_params(0)
        if args.checkpoint:
            from exsr.train.checkpoints import CheckpointManager
            mgr = CheckpointManager(os.path.abspath(args.checkpoint))
            state = mgr.restore({'g_params': session.params})
            session.load_params(state['g_params'])
        if 'VGG' in opt_objective:
            # feature net for the VGG-space distance; seeded random init —
            # pretrained VGG weights are converted offline when available
            # (models/vgg.py load_torch_vgg19_features)
            import jax
            import jax.numpy as jnp
            from exsr.models.vgg import VGG19Features
            vgg = VGG19Features()
            vp = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
            session.vgg_apply = jax.jit(lambda x: vgg.apply(vp, x))
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
                                     latent_channels=nz,
                                     checkpoint=args.checkpoint,
                                     upscale_kernel=est, nf=nf)
        t0 = time.time()
        hr_hw = (lr.shape[1] * args.scale, lr.shape[2] * args.scale)
        rec = {'name': name}
        if opt_objective:
            # per-image Z-optimization toward the mode's objective
            # (test.py:183-192; 250 iters by default)
            session.open_image(item['lr'], is_hr=False)
            data = {}
            if 'l1' in opt_objective or 'VGG' in opt_objective \
                    or 'hist' in opt_objective:
                if args.desired_im:
                    from PIL import Image
                    from scipy.ndimage import zoom
                    d = np.asarray(Image.open(args.desired_im)
                                   .convert('RGB'), np.float32) / 255.0
                    d = zoom(d, (hr_hw[0] / d.shape[0],
                                 hr_hw[1] / d.shape[1], 1),
                             order=1)[:hr_hw[0], :hr_hw[1]]
                else:
                    assert 'hr' in item, \
                        'desired_im modes need --desired_im or GT HR'
                    d = item['hr']
                data = ({'desired': [d]} if opt_objective == 'hist'
                        else {'desired': d[None]})
            res = session.optimize(opt_objective, data=data,
                                   max_iters=args.num_z_iters,
                                   time_budget_s=1e9)
            outs = [np.asarray(session.sr)]
            psnr_idx = 0
            rec['final_loss'] = float(res['final_loss'])
        else:
            rng = np.random.default_rng(i)
            zs, psnr_idx = build_zs(args, hr_hw, rng, nz=nz)
            outs = bucketed_sweep(fwd, lr, zs)
        dt = time.time() - t0
        sr0 = tensor2img(outs[psnr_idx])
        rec['time_s'] = dt
        if 'hr' in item:
            gt = tensor2img(item['hr'][None])
            b = args.scale
            rec['psnr'] = calculate_psnr(
                crop_border(sr0.astype(np.float64), b),
                crop_border(gt.astype(np.float64), b))
            rec['ssim'] = calculate_ssim(
                crop_border(sr0.astype(np.float64), b),
                crop_border(gt.astype(np.float64), b))
        # LR-consistency: downscale(SR) vs LR input (test.py:218-236) —
        # only the CEM-wrapped variants carry the guarantee
        if use_cem:
            down = imresize(outs[psnr_idx][0].astype(np.float64),
                            1.0 / args.scale)
            # the guarantee only holds inside the invalidity margins;
            # clamp so tiny images (interior smaller than the margins)
            # keep >=1 px instead of a mean over an empty slice
            m = max(int(cem_i.invalidity_margins_lr), 1)
            m = min(m, (min(down.shape[0], down.shape[1]) - 1) // 2)
            m = max(m, 1)
            if down.shape[0] > 2 * m and down.shape[1] > 2 * m:
                rec['consistency_mae'] = float(
                    np.mean(np.abs(down - item['lr'])[m:-m, m:-m]))
            # else: LR too small for any interior pixel after the margin
            # crop — the guarantee has no valid region to measure, so the
            # metric is omitted rather than reported as a NaN mean
        if len(outs) > 1:
            stack = np.stack([o[0] for o in outs])
            rec['per_pixel_std'] = float(stack.std(axis=0).mean())
            if 'hr' in item and use_cem:
                # GT high-frequency STD vs SR high-frequency STD across
                # the Z samples — the reference's 'stats' diversity
                # measure (test.py:218-236,281-287): the orthogonal-to-
                # null-space component is what Z exploration can vary
                proj = cem_i.project_2_ortho_2_ns(
                    item['hr'].astype(np.float64))
                rec['hr_std'] = float(
                    255 * (item['hr'] - proj).std(axis=(0, 1)).mean())
                hf = np.stack([o[0] - proj for o in outs])
                rec['sr_high_freq_std'] = float(255 * hf.std(axis=0).mean())
        results.append(rec)
        if args.save_images:
            from PIL import Image
            Image.fromarray(sr0).save(
                os.path.join(args.out_dir, f'{name}_SR.png'))
            if len(outs) > 1 and args.save_std_map:
                # normalized per-pixel diversity heatmap across the
                # sampled Zs (visual counterpart of per_pixel_std)
                sm = stack.std(axis=0).mean(-1)
                sm = sm / max(float(sm.max()), 1e-12)
                Image.fromarray(
                    (sm * 255).round().astype('uint8')).save(
                    os.path.join(args.out_dir, f'{name}_STDmap.png'))
        if args.z_sweep_gif > 1 and nz > 0:
            # sweep channel 0 of Z from -1 to 1 (test.py:289-319)
            from PIL import Image
            frames = []
            for v in np.linspace(-1.0, 1.0, args.z_sweep_gif):
                z = np.zeros((1,) + hr_hw + (nz,), np.float32)
                z[..., 0] = v
                frames.append(Image.fromarray(tensor2img(fwd(lr, z))))
            frames[0].save(
                os.path.join(args.out_dir, f'{name}_Zsweep.gif'),
                save_all=True, append_images=frames[1:], duration=150,
                loop=0)
        print(json.dumps(rec))

    summary = {'num_images': len(results)}
    for key in ('psnr', 'ssim', 'consistency_mae', 'per_pixel_std',
                'hr_std', 'sr_high_freq_std', 'final_loss'):
        vals = [r[key] for r in results if key in r]
        if vals:
            summary[f'avg_{key}'] = float(np.mean(vals))
    with open(os.path.join(args.out_dir, 'summary.json'), 'w') as f:
        json.dump({'summary': summary, 'per_image': results}, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == '__main__':
    main()
