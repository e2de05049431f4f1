"""Packed random-access image dataset — the lmdb replacement.

The reference reads training crops from lmdb databases
(data/util.py:58-70, scripts/create_lmdb.py); lmdb is not available in this
image, and a database layer is overkill for read-only training data.  This
is the same capability TPU-hosted-pipeline-style: one flat binary blob of
raw uint8 HWC images + a JSON index, read through a shared memmap (zero
per-worker open cost, page-cache friendly, safe across threads/processes).

  python -m exsr.apps.scripts pack --input_dir D --out data.pack   (writer)
  PackedImageDataset('data.pack')                                  (reader)
"""
from __future__ import annotations

import json
import os

import numpy as np


def pack_images(input_dir: str, out_path: str) -> int:
    """Write every image under input_dir into a .pack blob + .pack.json."""
    from exsr.data.datasets import list_images
    from PIL import Image
    index = []
    offset = 0
    with open(out_path, 'wb') as blob:
        for path in list_images(input_dir):
            arr = np.asarray(Image.open(path).convert('RGB'),
                             dtype=np.uint8)
            blob.write(np.ascontiguousarray(arr).tobytes())
            index.append({'name': os.path.basename(path),
                          'offset': offset, 'shape': list(arr.shape)})
            offset += arr.nbytes
    with open(out_path + '.json', 'w') as f:
        json.dump(index, f)
    return len(index)


class PackedImageDataset:
    """Random-access reader over a .pack blob; items match LRHRDataset's
    image-folder contract when wrapped by ``as_hr_source``."""

    def __init__(self, pack_path: str):
        with open(pack_path + '.json') as f:
            self.index = json.load(f)
        self._mm = np.memmap(pack_path, dtype=np.uint8, mode='r')

    def __len__(self):
        return len(self.index)

    def read(self, i: int) -> np.ndarray:
        ent = self.index[i]
        h, w, c = ent['shape']
        start = ent['offset']
        arr = self._mm[start:start + h * w * c].reshape(h, w, c)
        return np.asarray(arr, dtype=np.float32) / 255.0

    def name(self, i: int) -> str:
        return self.index[i]['name']


class PackedLRHRDataset:
    """LRHR pairs from a packed HR blob with on-the-fly consistent LR
    (drop-in alternative to LRHRDataset for packed data)."""

    def __init__(self, pack_path: str, scale: int,
                 patch_size: int | None = None, train: bool = True,
                 use_flip: bool = True, use_rot: bool = True,
                 registry=None):
        self.packed = PackedImageDataset(pack_path)
        self.scale = scale
        self.patch_size = patch_size
        self.train = train
        self.use_flip = use_flip
        self.use_rot = use_rot
        self.registry = registry

    def __len__(self):
        return len(self.packed)

    def __getitem__(self, idx: int, rng: np.random.Generator | None = None):
        from exsr.data.datasets import augment
        from exsr.ops.resize import imresize
        from exsr.utils.color import modcrop
        rng = rng or np.random.default_rng()
        hr = modcrop(self.packed.read(idx), self.scale)
        lr = imresize(hr, 1.0 / self.scale, registry=self.registry)
        if self.train and self.patch_size:
            ps, s = self.patch_size, self.scale
            lps = ps // s
            h, w = lr.shape[:2]
            y = int(rng.integers(0, h - lps + 1))
            x = int(rng.integers(0, w - lps + 1))
            lr = lr[y:y + lps, x:x + lps]
            hr = hr[y * s:(y + lps) * s, x * s:(x + lps) * s]
            hf = self.use_flip and rng.random() < 0.5
            vf = self.use_flip and rng.random() < 0.5
            rot = self.use_rot and rng.random() < 0.5
            lr, hr = augment([lr, hr], hf, vf, rot)
        return {'lr': lr.astype(np.float32), 'hr': hr.astype(np.float32),
                'path': self.packed.name(idx)}
