"""Explorable-JPEG evaluation CLI — the reference's codes/test_JPEG.py.

Per image and quality factor: decode quantized DCT coefficients through the
generator (Z=0), report PSNR vs the uncompressed source, PSNR of plain JPEG
decoding (the baseline the generator must beat), and quantization-bin
consistency of the output coefficients.

Usage:
  python -m exsr.apps.eval_jpeg --data_dir DIR --qf 10 30 50 \
      [--checkpoint CKPT] [--out_dir results]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data_dir', required=True)
    p.add_argument('--qf', type=int, nargs='+', default=[10])
    p.add_argument('--nf', type=int, default=320)
    p.add_argument('--nb', type=int, default=10)
    p.add_argument('--latent_channels', type=int, default=64)
    p.add_argument('--checkpoint')
    p.add_argument('--step', type=int, default=None,
                   help='checkpoint step to load (default: latest)')
    p.add_argument('--out_dir', default='results_jpeg')
    p.add_argument('--max_images', type=int, default=None)
    p.add_argument('--num_z', type=int, default=1,
                   help='Z samples for the diversity sweep: Z=0 plus '
                        'num_z-1 random uniform Zs; reports the per-pixel '
                        'STD across decodings (test_JPEG.py:135-140, '
                        'stats :283-299)')
    p.add_argument('--latent', default='rand_uniform',
                   choices=['rand_uniform', 'desired_im', 'undesired_im',
                            'max_std', 'min_std'],
                   help='eval-time latent mode (test_JPEG.py:31,124-158): '
                        'the *_im / *_std modes optimize Z per image '
                        '(toward/away from the uncompressed Y, or to an '
                        'STD extremum) before scoring')
    p.add_argument('--num_z_iters', type=int, default=250,
                   help='Z-optimization iterations for the optimizer '
                        'modes (test_JPEG.py NUM_Z_ITERS)')
    p.add_argument('--save_images', action='store_true',
                   help='save the decoded Y images (plain JPEG + model '
                        'decode) per image/QF (test_JPEG.py save_img '
                        'path)')
    p.add_argument('--z_sweep_gif', type=int, default=0, metavar='N',
                   help='export an N-frame GIF sweeping the first '
                        '3-channel Z control from -1 to 1 per image '
                        "(test_JPEG.py TEST_TYPE='GIF'; 64-channel Z via "
                        'Repeat_Z_3_channels, DecompCNN_model.py:293-314)')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from exsr.models.dncnn import DnCNN, DnCNNConfig
    from exsr.jpeg.codec import JPEGCodec
    from exsr.data.datasets import list_images, read_img
    from exsr.utils.color import rgb2ycbcr
    from exsr.utils.metrics import calculate_psnr

    codec = JPEGCodec()
    gcfg = DnCNNConfig(n_channels=args.nf, depth=args.nb,
                       num_latent_channels=args.latent_channels)
    g = DnCNN(gcfg)
    g_vars = None
    if args.checkpoint:
        # accepts either a `scripts export_g` output or a train_jpeg
        # TRAIN-state directory (both expose a 'g_params' subtree)
        import os as _os
        from exsr.train.checkpoints import CheckpointManager
        dummy = jnp.zeros((1, 8, 8, 64))
        dz = jnp.zeros((1, 8, 8, args.latent_channels))
        template = dict(g.init(jax.random.PRNGKey(0), dummy, dz))
        mgr = CheckpointManager(_os.path.abspath(args.checkpoint))
        step = args.step if args.step is not None else mgr.latest_step()
        assert step is not None, \
            f'no checkpoints under {args.checkpoint}'
        raw = mgr.restore_raw(step)
        from exsr.models.convert import align_params_to
        g_vars = jax.tree.map(jnp.asarray,
                              align_params_to(template, raw['g_params']))
        print(f'loaded generator from {args.checkpoint} (step {step})')

    opt_objective = {'desired_im': 'l1', 'undesired_im': 'max_l1',
                     'max_std': 'max_STD',
                     'min_std': 'min_STD'}.get(args.latent)
    session = None
    if opt_objective:
        from exsr.apps.jpeg_session import JPEGEditSession
        session = JPEGEditSession(nf=args.nf, nb=args.nb,
                                  latent_channels=args.latent_channels)
        if g_vars is not None:
            session.load_params(g_vars)
        else:
            session.init_random_params(0)
            g_vars = session.params

    @jax.jit
    def decode(g_vars, comp, z, qf):
        if 'batch_stats' in g_vars:
            coeffs, _ = g.apply(g_vars, comp, z, train=False,
                                mutable=['batch_stats'])
        else:
            coeffs = g.apply(g_vars, comp, z, train=False)
        return codec.extract(coeffs, qf), coeffs

    paths = list_images(args.data_dir)
    if args.max_images:
        paths = paths[:args.max_images]
    os.makedirs(args.out_dir, exist_ok=True)
    results = []
    for img_idx, path in enumerate(paths):
        img = read_img(path)
        y = rgb2ycbcr(img.astype(np.float32), only_y=True) * 255.0
        h, w = (y.shape[0] // 8) * 8, (y.shape[1] // 8) * 8
        y = y[:h, :w][None, ..., None].astype(np.float32)
        for qf in args.qf:
            decoded_y = None   # model decode in [0, 255] for --save_images
            qf_arr = jnp.asarray([float(qf)])
            comp = codec.compress(jnp.asarray(y), qf_arr, quantize=True)
            plain = np.asarray(codec.extract(comp, qf_arr))
            rec = {'name': os.path.basename(path), 'qf': qf,
                   'psnr_jpeg': calculate_psnr(plain[0, ..., 0],
                                               y[0, ..., 0])}
            if g_vars is None and args.checkpoint is None:
                # no trained model: initialize lazily with random weights
                z0 = jnp.zeros(comp.shape[:3] + (args.latent_channels,))
                g_vars = dict(g.init(jax.random.PRNGKey(0), comp, z0))
            if opt_objective:
                # per-image Z-optimization before scoring
                # (test_JPEG.py:124-158 optimizer latent modes)
                session.open_image(img[:h, :w], qf=qf)
                data = {}
                if 'l1' in opt_objective:
                    # the uncompressed Y is the natural desired target:
                    # how closely can the in-bin manifold approach it?
                    data['desired'] = (np.asarray(session.y_image)
                                       / 255.0)
                res = session.optimize(opt_objective, data=data,
                                       max_iters=args.num_z_iters)
                out = np.asarray(session.out)
                decoded_y = out[0, ..., 0] * 255.0
                rec['psnr_decomp'] = calculate_psnr(
                    decoded_y, y[0, ..., 0])
                losses = np.asarray(res['losses'])
                losses = losses[np.isfinite(losses)]
                if losses.size:
                    rec['final_loss'] = float(losses[-1])
            elif g_vars is not None:
                nz = max(1, args.num_z)
                zshape = comp.shape[:3] + (args.latent_channels,)
                zs = [np.zeros(zshape, np.float32)]
                # per-(image, qf) seed: the diversity statistic needs
                # independent Z draws per image, not one reused set
                rng = np.random.default_rng(img_idx * 1009 + qf)
                for _ in range(nz - 1):
                    # spatially-constant per channel like the reference's
                    # [N, 1, C, 1, 1] draw (test_JPEG.py:140)
                    v = rng.uniform(-1, 1, (1, 1, 1, zshape[-1]))
                    zs.append(np.broadcast_to(v, zshape)
                              .astype(np.float32))
                z = jnp.asarray(np.concatenate(zs, 0))
                comp_b = jnp.repeat(comp, nz, 0)
                out, coeffs = decode(g_vars, comp_b, z,
                                     jnp.full((nz,), float(qf)))
                out = np.asarray(out)
                decoded_y = out[0, ..., 0]
                rec['psnr_decomp'] = calculate_psnr(decoded_y,
                                                    y[0, ..., 0])
                rec['bin_consistency_max'] = float(
                    jnp.abs(coeffs - comp_b).max())
                if nz > 1:
                    # pixel-space diversity across the Z samples
                    # (test_JPEG.py stats: per-pixel STD of decodings)
                    rec['per_pixel_std'] = float(out.std(axis=0).mean())
            if (args.z_sweep_gif > 1 and g_vars is not None
                    and args.latent_channels > 0 and not opt_objective):
                # sweep the first 3-channel Z control from -1 to 1
                # (test_JPEG.py TEST_TYPE='GIF')
                from PIL import Image as PILImage
                from exsr.train.decomp import repeat_z_3_channels
                frames = []
                for v in np.linspace(-1.0, 1.0, args.z_sweep_gif):
                    z3 = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(float(v))
                    z64 = jnp.broadcast_to(
                        repeat_z_3_channels(z3, args.latent_channels),
                        comp.shape[:3] + (args.latent_channels,))
                    fr, _ = decode(g_vars, comp, z64, qf_arr)
                    frames.append(PILImage.fromarray(np.clip(
                        np.asarray(fr)[0, ..., 0], 0, 255)
                        .astype(np.uint8)))
                gname = os.path.splitext(os.path.basename(path))[0]
                frames[0].save(
                    os.path.join(args.out_dir,
                                 f'{gname}_qf{qf}_Zsweep.gif'),
                    save_all=True, append_images=frames[1:],
                    duration=150, loop=0)
            if args.save_images:
                from PIL import Image as PILImage
                base = os.path.splitext(os.path.basename(path))[0]
                PILImage.fromarray(np.clip(plain[0, ..., 0], 0, 255)
                                   .astype(np.uint8)).save(
                    os.path.join(args.out_dir,
                                 f'{base}_qf{qf}_jpeg.png'))
                if decoded_y is not None:
                    PILImage.fromarray(np.clip(decoded_y, 0, 255)
                                       .astype(np.uint8)).save(
                        os.path.join(args.out_dir,
                                     f'{base}_qf{qf}_decomp.png'))
            results.append(rec)
            print(json.dumps(rec))
    summary = {}
    for key in ('psnr_jpeg', 'psnr_decomp', 'per_pixel_std', 'final_loss'):
        vals = [r[key] for r in results if key in r]
        if vals:
            summary[f'avg_{key}'] = float(np.mean(vals))
    with open(os.path.join(args.out_dir, 'summary.json'), 'w') as f:
        json.dump({'summary': summary, 'per_image': results}, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == '__main__':
    main()
