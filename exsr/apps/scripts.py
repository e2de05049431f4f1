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


def extract_subimages(input_dir, output_dir, crop_size=480, step=240,
                      threshold=48, workers=8):
    """Crop sub-images on a sliding grid (extract_subimgs_single.py)."""
    from exsr.data.datasets import list_images
    os.makedirs(output_dir, exist_ok=True)
    paths = list_images(input_dir)

    def process(path):
        from PIL import Image
        img = np.asarray(Image.open(path).convert('RGB'))
        h, w = img.shape[:2]
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

    with ProcessPoolExecutor(max_workers=workers) as ex:
        total = sum(ex.map(process, paths))
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


if __name__ == '__main__':
    main()
