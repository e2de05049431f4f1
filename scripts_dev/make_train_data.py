"""Regenerate the zero-egress training tiles (the r3/r4 convergence-run
dataset): 280px grid crops of the 3 natural images available in the build
image (sklearn china/flower, matplotlib grace_hopper), split train/val.

Usage: python scripts_dev/make_train_data.py [out_root]
"""
import os
import sys

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(out_root=None):
    out_root = out_root or os.path.join(ROOT, 'experiments', 'data')
    train_dir = os.path.join(out_root, 'train')
    val_dir = os.path.join(out_root, 'val')
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)

    imgs = []
    from sklearn.datasets import load_sample_images
    for arr in load_sample_images().images:
        imgs.append(np.asarray(arr, np.uint8))
    import matplotlib.cbook as cbook
    with cbook.get_sample_data('grace_hopper.jpg') as f:
        imgs.append(np.asarray(Image.open(f).convert('RGB')))

    from exsr.apps.scripts import extract_subimages
    src = os.path.join(out_root, 'src')
    os.makedirs(src, exist_ok=True)
    for i, a in enumerate(imgs):
        Image.fromarray(a).save(os.path.join(src, f'src{i}.png'))
    tiles = os.path.join(out_root, 'tiles')
    extract_subimages(src, tiles, 280, 120)
    names = sorted(os.listdir(tiles))
    # every 8th tile -> val (held out), rest train
    n_train = n_val = 0
    for j, n in enumerate(names):
        dst = val_dir if j % 8 == 3 else train_dir
        os.replace(os.path.join(tiles, n), os.path.join(dst, n))
        if j % 8 == 3:
            n_val += 1
        else:
            n_train += 1
    print(f'train {n_train} val {n_val} tiles at {out_root}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else None)
