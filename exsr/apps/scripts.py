"""Dataset-prep and result tooling — the reference's codes/scripts/.

Subcommands (``python -m exsr.apps.scripts <cmd> ...``):
  extract_subimages   crop large HR images into training sub-images
                      (extract_subimgs_single.py — multiprocess cropper)
  generate_mod_lr     create modcropped HR + consistent LR pairs
                      (generate_mod_LR_bic.py, via the CEM resize kernels)
  gaussian_kernel     synthesize a gaussian upscale kernel .npy
                      (create_gaussian_upscale_kernel.py)
  net_interp          interpolate two checkpoints' G params (net_interp.py —
                      PSNR<->GAN tradeoff)
  make_gif            Z-sweep GIF from a results dir (make_gif_video.py)
  color2gray          grayscale copies of a folder (color2gray.py)
"""
from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def _extract_one(args):
    """Worker for extract_subimages — module-level so the process pool can
    pickle it (a local closure cannot be)."""
    path, output_dir, crop_size, step, threshold = args
    from PIL import Image
    img = np.asarray(Image.open(path).convert('RGB'))
    h, w = img.shape[:2]
    if h < crop_size or w < crop_size:
        return 0
    name = os.path.splitext(os.path.basename(path))[0]
    n = 0
    ys = list(range(0, h - crop_size + 1, step))
    xs = list(range(0, w - crop_size + 1, step))
    if h - (ys[-1] + crop_size) > threshold:
        ys.append(h - crop_size)
    if w - (xs[-1] + crop_size) > threshold:
        xs.append(w - crop_size)
    for y in ys:
        for x in xs:
            n += 1
            crop = img[y:y + crop_size, x:x + crop_size]
            Image.fromarray(crop).save(
                os.path.join(output_dir, f'{name}_s{n:03d}.png'))
    return n


def extract_subimages(input_dir, output_dir, crop_size=480, step=240,
                      threshold=48, workers=8):
    """Crop sub-images on a sliding grid (extract_subimgs_single.py)."""
    from exsr.data.datasets import list_images
    os.makedirs(output_dir, exist_ok=True)
    paths = list_images(input_dir)
    jobs = [(p, output_dir, crop_size, step, threshold) for p in paths]
    with ProcessPoolExecutor(max_workers=workers) as ex:
        total = sum(ex.map(_extract_one, jobs))
    print(f'extracted {total} sub-images from {len(paths)} images')


def generate_mod_lr(input_dir, output_dir, scale=4):
    """HR modcrop + consistent LR pairs via the CEM kernels
    (generate_mod_LR_bic.py)."""
    from PIL import Image
    from exsr.data.datasets import list_images, read_img
    from exsr.utils.color import modcrop
    from exsr.ops.resize import imresize
    hr_dir = os.path.join(output_dir, f'HRx{scale}')
    lr_dir = os.path.join(output_dir, f'LRx{scale}')
    os.makedirs(hr_dir, exist_ok=True)
    os.makedirs(lr_dir, exist_ok=True)
    for path in list_images(input_dir):
        name = os.path.basename(path)
        hr = modcrop(read_img(path), scale)
        lr = imresize(hr, 1.0 / scale)
        Image.fromarray((hr * 255).round().astype(np.uint8)).save(
            os.path.join(hr_dir, name))
        Image.fromarray(np.clip(lr * 255, 0, 255).round().astype(
            np.uint8)).save(os.path.join(lr_dir, name))
    print(f'wrote pairs to {output_dir}')


def gaussian_kernel(sigma, out_path):
    """create_gaussian_upscale_kernel.py."""
    from exsr.ops.resize import gaussian_2d
    np.save(out_path, gaussian_2d(sigma))
    print(f'saved gaussian kernel sigma={sigma} to {out_path}')


def net_interp(ckpt_a, ckpt_b, alpha, out_path):
    """Linear interpolation of two G checkpoints (net_interp.py:1-20):
    params = (1-alpha)*A + alpha*B."""
    import jax
    a = dict(np.load(ckpt_a, allow_pickle=True))
    b = dict(np.load(ckpt_b, allow_pickle=True))
    out = {k: (1 - alpha) * a[k] + alpha * b[k] for k in a}
    np.savez(out_path, **out)
    print(f'interpolated (alpha={alpha}) -> {out_path}')


def make_gif(frames_dir, out_path, duration_ms=200):
    """Z-sweep GIF (make_gif_video.py)."""
    from PIL import Image
    from exsr.data.datasets import list_images
    frames = [Image.open(p) for p in list_images(frames_dir)]
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
    print(f'wrote {len(frames)}-frame GIF to {out_path}')


def color2gray(input_dir, output_dir):
    """color2gray.py."""
    from PIL import Image
    from exsr.data.datasets import list_images
    os.makedirs(output_dir, exist_ok=True)
    for p in list_images(input_dir):
        Image.open(p).convert('L').save(
            os.path.join(output_dir, os.path.basename(p)))
    print('done')


def results_2_video(images_dir, out_path, fps=5, blink_seconds=40):
    """Validation-progress video (scripts/results_2_video.py:1-37): frames
    sorted by the step number before '_PSNR' in the filename, step number
    drawn on each frame, then a first/final blinking comparison tail.
    Writes an animated GIF (no ffmpeg/cv2 codecs needed in this image)."""
    import re
    from PIL import Image, ImageDraw

    names = [f for f in os.listdir(images_dir) if f.endswith('.png')
             and re.search(r'(\d)+(?=_PSNR)', f)]
    names.sort(key=lambda x: int(re.search(r'(\d)+(?=_PSNR)', x).group(0)))
    assert names, f'no <step>_PSNR*.png frames in {images_dir}'

    def labeled(name, text):
        im = Image.open(os.path.join(images_dir, name)).convert('RGB')
        ImageDraw.Draw(im).text((4, 4), text, fill=(255, 255, 255))
        return im

    frames = [labeled(n, re.search(r'(\d)+(?=_PSNR)', n).group(0))
              for n in names]
    first = frames[0]
    last_step = re.search(r'(\d)+(?=_PSNR)', names[-1]).group(0)
    final = labeled(names[-1], f'Final ({last_step})')
    for sec in range(blink_seconds):
        frames.extend([final if sec % 2 else first] * fps)
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    print(f'wrote {len(frames)}-frame video to {out_path}')


def fft_comparison(folder_a, out_path, folder_b=None):
    """Average log-spectrum analysis (FFT_comparison.py:1-61): mean over a
    results folder of log|FFT| of the grayscale images — or, with
    ``folder_b``, the log ratio of spectra between two result sets
    (matched by the leading image name), visualizing which frequencies a
    model reconstructs more strongly."""
    from PIL import Image
    from exsr.data.datasets import list_images

    paths_a = list_images(folder_a)
    by_name_b = {}
    if folder_b:
        for p in list_images(folder_b):
            key = os.path.basename(p).split('.')[0].split('_')[0]
            by_name_b[key] = p

    def gray(path):
        return np.asarray(Image.open(path).convert('L'),
                          np.float64) / 255.0

    specs, max_dims = [], [0, 0]
    for p in paths_a:
        fa = np.abs(np.fft.fft2(gray(p)))
        if folder_b:
            key = os.path.basename(p).split('.')[0].split('_')[0]
            if key not in by_name_b:
                continue
            fb = np.abs(np.fft.fft2(gray(by_name_b[key])))
            spec = np.log(fa / (np.finfo(np.float64).eps + fb))
        else:
            spec = np.log(np.maximum(fa, np.finfo(np.float64).eps))
        specs.append(spec)
        max_dims = [max(max_dims[0], spec.shape[0]),
                    max(max_dims[1], spec.shape[1])]
    assert specs, 'no comparable images found'
    from exsr.ops.filters import bilinear_resize
    import jax.numpy as jnp
    resized = [np.asarray(bilinear_resize(
        jnp.asarray(s, jnp.float32)[None, :, :, None],
        max_dims[0], max_dims[1]))[0, :, :, 0] for s in specs]
    mean_spec = np.mean(np.stack(resized), 0)
    scale = np.percentile(np.abs(mean_spec), 99) or 1.0
    np.savez(out_path if out_path.endswith('.npz') else out_path + '.npz',
             mean_log_spectrum=mean_spec, scale=scale,
             n_images=len(resized))
    # also render a PNG heatmap (fftshifted, signed red/green for ratios)
    vis = np.fft.fftshift(mean_spec / scale)
    if folder_b:
        rgb = np.stack([np.clip(-vis, 0, 1), np.clip(vis, 0, 1),
                        np.zeros_like(vis)], -1)
    else:
        v = np.clip((vis + 1) / 2, 0, 1)
        rgb = np.stack([v, v, v], -1)
    png = out_path.rsplit('.', 1)[0] + '.png'
    Image.fromarray((rgb * 255).astype(np.uint8)).save(png)
    print(f'wrote spectrum ({len(resized)} images) to {png}')
    return mean_spec


def transfer_files(source_dir: str, target_dir: str,
                   pattern: str = 's00.png,s00_LR.png'):
    """Copy result files whose names contain any comma-separated
    ``pattern`` into a fresh target folder (scripts/transfer_files.py:1-16
    — result-sharing helper; refuses to overwrite an existing target)."""
    import shutil

    assert not os.path.isdir(target_dir), \
        f'target folder already exists: {target_dir}'
    pats = [p for p in pattern.split(',') if p]
    names = [n for n in sorted(os.listdir(source_dir))
             if any(p in n for p in pats)]
    os.makedirs(target_dir)
    for n in names:
        shutil.copyfile(os.path.join(source_dir, n),
                        os.path.join(target_dir, n))
    print(f'copied {len(names)} files to {target_dir}')
    return len(names)


def convert_torch_g(pth: str, out_dir: str, nb: int = 23,
                    latent_channels: int = 3, scale: int = 4,
                    nf: int = 64, gc: int = 32, arch: str = 'rrdb'):
    """Reference G checkpoint (.pth) -> orbax checkpoint consumable by
    ``eval_sr --checkpoint`` / ``web --checkpoint`` (the reference user's
    migration path; base_model.py:128-190 load semantics).  ``arch``:
    'rrdb' (ESRGAN/explorable) or 'msrresnet' (train_srgan.json's
    MSRResNet, architecture.py:18-66)."""
    import os

    import jax
    import jax.numpy as jnp

    from exsr.models.convert import (align_params_to, convert_esrgan_rrdb,
                                     convert_msrresnet,
                                     load_torch_checkpoint)
    from exsr.models.rrdb import RRDBNet
    from exsr.train.checkpoints import CheckpointManager

    state = load_torch_checkpoint(pth)
    if arch == 'msrresnet':
        from exsr.models.classifiers import MSRResNet
        assert latent_channels == 0, 'MSRResNet has no latent input'
        converted = convert_msrresnet(state, nf=nf, nb=nb, upscale=scale)
        g = MSRResNet(nf=nf, nb=nb, upscale=scale)
        template = g.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 3)))
        params = align_params_to(template, jax.tree.map(jnp.asarray,
                                                        converted))
        mgr = CheckpointManager(os.path.abspath(out_dir))
        mgr.save(0, {'g_params': params}, force=True)
        mgr.wait()
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f'converted {pth} -> {out_dir} ({n:,} params)')
        return
    converted = convert_esrgan_rrdb(state, nb=nb,
                                    latent_channels=latent_channels)
    g = RRDBNet(nb=nb, nf=nf, gc=gc, upscale=scale,
                latent_channels=latent_channels)
    template = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                      jnp.zeros((1, 16 * scale, 16 * scale,
                                 latent_channels))
                      if latent_channels else None)
    params = align_params_to(template, converted)
    mgr = CheckpointManager(os.path.abspath(out_dir))
    mgr.save(0, {'g_params': params}, force=True)
    mgr.wait()
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f'converted {pth} -> {out_dir} ({n:,} params)')


def official_parity(pth: str, hr_dir: str, out_dir: str, nb: int = 23,
                    latent_channels: int = 3, scale: int = 4,
                    nf: int = 64, gc: int = 32, num_z: int = 1,
                    max_images: int | None = None):
    """ONE command from the paper's released ``.pth`` to its PSNR/SSIM/
    consistency/diversity table: convert the torch G, then run ``eval_sr``
    at Z=0 (+ ``num_z-1`` random Zs) on a Set5-style HR dir.

    This is the parity check against the downloadable pretrained
    explorable model the reference GUI loads (codes/README.md:40-43;
    ESRGAN warm start at :62).  The zero-egress build image has neither
    the Drive checkpoint nor DIV2K, so the recipe is validated in-test on
    a synthetic flagship-shaped .pth (tests/test_torch_parity.py) — the
    day real weights are available:

        python -m exsr.apps.scripts official_parity \\
            --pth trained_model.pth --hr_dir Set5_HR --out results/parity
    """
    ckpt = os.path.join(out_dir, 'converted_ckpt')
    convert_torch_g(pth, ckpt, nb=nb, latent_channels=latent_channels,
                    scale=scale, nf=nf, gc=gc)
    from exsr.apps import eval_sr
    argv = ['--hr_dir', hr_dir, '--checkpoint', ckpt,
            '--scale', str(scale), '--nb', str(nb), '--nf', str(nf),
            '--latent_channels', str(latent_channels),
            '--latent', 'rand_uniform', '--num_z', str(num_z),
            '--out_dir', out_dir]
    if max_images:
        argv += ['--max_images', str(max_images)]
    return eval_sr.main(argv)


def psnr_ssim(gt_dir: str, gen_dir: str, crop: int = 4, y_only: bool =
              False, suffix: str = ''):
    """Folder-vs-folder MATLAB-compatible PSNR/SSIM table
    (metrics/calculate_PSNR_SSIM.py:12-92): match Gen images to GT by
    basename (+optional suffix), crop borders, optionally evaluate the
    YCbCr Y channel only. Returns (mean_psnr, mean_ssim)."""
    from PIL import Image
    from exsr.utils.metrics import calculate_psnr, calculate_ssim
    from exsr.utils.color import rgb2ycbcr
    psnrs, ssims = [], []
    names = sorted(os.listdir(gt_dir))
    for i, name in enumerate(names):
        base, _ = os.path.splitext(name)
        gen_path = None
        for ext in ('.png', '.jpg', '.bmp'):
            cand = os.path.join(gen_dir, base + suffix + ext)
            if os.path.exists(cand):
                gen_path = cand
                break
        if gen_path is None:
            print(f'--- {base}: no Gen image, skipped')
            continue
        gt = np.asarray(Image.open(os.path.join(gt_dir, name))
                        .convert('RGB'), np.float64) / 255.0
        gen = np.asarray(Image.open(gen_path).convert('RGB'),
                         np.float64) / 255.0
        if y_only:
            gt, gen = rgb2ycbcr(gt), rgb2ycbcr(gen)
        if crop:
            gt = gt[crop:-crop, crop:-crop]
            gen = gen[crop:-crop, crop:-crop]
        ps = calculate_psnr(gt * 255, gen * 255)
        ss = calculate_ssim(gt * 255, gen * 255)
        psnrs.append(ps)
        ssims.append(ss)
        print(f'{i + 1:3d} - {base:25s}\tPSNR: {ps:.6f} dB, '
              f'\tSSIM: {ss:.6f}')
    mp = float(np.mean(psnrs)) if psnrs else float('nan')
    ms = float(np.mean(ssims)) if ssims else float('nan')
    print(f'Average: PSNR: {mp:.6f} dB, SSIM: {ms:.6f}')
    return mp, ms


def export_g(train_ckpt: str, out_dir: str):
    """Extract the generator params from a train_sr/train_jpeg TRAIN-state
    checkpoint into the {'g_params'} layout consumed by eval_sr / web /
    sessions (the reference ships per-net .pth files; our train state is
    one joint pytree — base_model.save_network vs SRRaGAN_model.save)."""
    import os
    import jax
    # pure host-side tree surgery — never stage through the TPU tunnel
    # (eager per-leaf device puts make the restore minutes-slow)
    jax.config.update('jax_platforms', 'cpu')
    from exsr.train.checkpoints import CheckpointManager
    src = CheckpointManager(os.path.abspath(train_ckpt))
    step = src.latest_step()
    assert step is not None, f'no checkpoints under {train_ckpt}'
    raw = src.restore_raw(step)
    g_params = raw['g_params']
    dst = CheckpointManager(os.path.abspath(out_dir))
    # save under the TRAIN step (consumers restore latest_step), so
    # re-exporting after further training writes a NEW step instead of
    # silently no-opping on an existing one (save returns False then)
    wrote = dst.save(step, {'g_params': g_params}, force=True)
    dst.wait()
    n = sum(x.size for x in jax.tree.leaves(g_params))
    if not wrote:
        print(f'step {step} already exported in {out_dir} — unchanged')
    else:
        print(f'exported step-{step} generator ({n:,} params) '
              f'-> {out_dir}')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    s = sub.add_parser('extract_subimages')
    s.add_argument('--input_dir', required=True)
    s.add_argument('--output_dir', required=True)
    s.add_argument('--crop_size', type=int, default=480)
    s.add_argument('--step', type=int, default=240)
    s = sub.add_parser('generate_mod_lr')
    s.add_argument('--input_dir', required=True)
    s.add_argument('--output_dir', required=True)
    s.add_argument('--scale', type=int, default=4)
    s = sub.add_parser('gaussian_kernel')
    s.add_argument('--sigma', type=float, required=True)
    s.add_argument('--out', required=True)
    s = sub.add_parser('net_interp')
    s.add_argument('--ckpt_a', required=True)
    s.add_argument('--ckpt_b', required=True)
    s.add_argument('--alpha', type=float, default=0.5)
    s.add_argument('--out', required=True)
    s = sub.add_parser('make_gif')
    s.add_argument('--frames_dir', required=True)
    s.add_argument('--out', required=True)
    s = sub.add_parser('color2gray')
    s.add_argument('--input_dir', required=True)
    s.add_argument('--output_dir', required=True)
    s = sub.add_parser('pack')
    s.add_argument('--input_dir', required=True)
    s.add_argument('--out', required=True)
    s = sub.add_parser('results_2_video')
    s.add_argument('--images_dir', required=True)
    s.add_argument('--out', required=True)
    s.add_argument('--fps', type=int, default=5)
    s.add_argument('--blink_seconds', type=int, default=40)
    s = sub.add_parser('fft_comparison')
    s.add_argument('--folder_a', required=True)
    s.add_argument('--folder_b')
    s.add_argument('--out', required=True)
    s = sub.add_parser('transfer_files')
    s.add_argument('--source_dir', required=True)
    s.add_argument('--target_dir', required=True)
    s.add_argument('--pattern', default='s00.png,s00_LR.png')
    s = sub.add_parser('convert_torch_g')
    s.add_argument('--pth', required=True,
                   help='reference G checkpoint (.pth; plain ESRGAN or '
                        'trained explorable, DataParallel/CEM-wrapped ok)')
    s.add_argument('--out', required=True,
                   help='orbax checkpoint dir (usable as --checkpoint for '
                        'eval_sr / web)')
    s.add_argument('--nb', type=int, default=23)
    s.add_argument('--latent_channels', type=int, default=3)
    s.add_argument('--scale', type=int, default=4)
    s.add_argument('--nf', type=int, default=64)
    s.add_argument('--gc', type=int, default=32)
    s.add_argument('--arch', choices=['rrdb', 'msrresnet'],
                   default='rrdb',
                   help="generator family: 'rrdb' (ESRGAN/explorable) or "
                        "'msrresnet' (train_srgan.json); msrresnet "
                        'requires --latent_channels 0')
    s = sub.add_parser('official_parity')
    s.add_argument('--pth', required=True,
                   help="the paper's released G checkpoint (.pth)")
    s.add_argument('--hr_dir', required=True,
                   help='Set5-style ground-truth HR dir')
    s.add_argument('--out', required=True, help='results dir')
    s.add_argument('--nb', type=int, default=23)
    s.add_argument('--latent_channels', type=int, default=3)
    s.add_argument('--scale', type=int, default=4)
    s.add_argument('--nf', type=int, default=64)
    s.add_argument('--gc', type=int, default=32)
    s.add_argument('--num_z', type=int, default=1)
    s.add_argument('--max_images', type=int, default=None)
    s = sub.add_parser('psnr_ssim')
    s.add_argument('--gt_dir', required=True)
    s.add_argument('--gen_dir', required=True)
    s.add_argument('--crop_border', type=int, default=4)
    s.add_argument('--y_only', action='store_true')
    s.add_argument('--suffix', default='')
    s = sub.add_parser('export_g')
    s.add_argument('--train_ckpt', required=True,
                   help='train_sr/train_jpeg experiment ckpt dir')
    s.add_argument('--out', required=True,
                   help='orbax checkpoint dir (usable as --checkpoint for '
                        'eval_sr / web)')
    args = p.parse_args(argv)
    if args.cmd == 'extract_subimages':
        extract_subimages(args.input_dir, args.output_dir, args.crop_size,
                          args.step)
    elif args.cmd == 'generate_mod_lr':
        generate_mod_lr(args.input_dir, args.output_dir, args.scale)
    elif args.cmd == 'gaussian_kernel':
        gaussian_kernel(args.sigma, args.out)
    elif args.cmd == 'net_interp':
        net_interp(args.ckpt_a, args.ckpt_b, args.alpha, args.out)
    elif args.cmd == 'make_gif':
        make_gif(args.frames_dir, args.out)
    elif args.cmd == 'color2gray':
        color2gray(args.input_dir, args.output_dir)
    elif args.cmd == 'pack':
        from exsr.data.packed import pack_images
        n = pack_images(args.input_dir, args.out)
        print(f'packed {n} images into {args.out}')
    elif args.cmd == 'results_2_video':
        results_2_video(args.images_dir, args.out, args.fps,
                        args.blink_seconds)
    elif args.cmd == 'fft_comparison':
        fft_comparison(args.folder_a, args.out, args.folder_b)
    elif args.cmd == 'transfer_files':
        transfer_files(args.source_dir, args.target_dir, args.pattern)
    elif args.cmd == 'convert_torch_g':
        convert_torch_g(args.pth, args.out, args.nb, args.latent_channels,
                        args.scale, args.nf, args.gc, args.arch)
    elif args.cmd == 'official_parity':
        official_parity(args.pth, args.hr_dir, args.out, args.nb,
                        args.latent_channels, args.scale, args.nf,
                        args.gc, args.num_z, args.max_images)
    elif args.cmd == 'psnr_ssim':
        psnr_ssim(args.gt_dir, args.gen_dir, args.crop_border,
                  args.y_only, args.suffix)
    elif args.cmd == 'export_g':
        export_g(args.train_ckpt, args.out)


if __name__ == '__main__':
    main()
