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


def _require_lmdb():
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover - image has no lmdb
        raise ImportError(
            'lmdb is not installed in this environment; use the .pack '
            'format (pack_images/PackedImageDataset) instead') from e
    return lmdb


class LmdbImageDataset:
    """Reader for the reference's lmdb layout, behind an import guard.

    Format (scripts/create_lmdb.py:38-52, data/util.py:85-93): raw uint8
    image bytes under ``<name>``, shape under ``<name>.meta`` as
    ``"H, W, C"``; images were written by cv2 so they are stored BGR and
    converted to RGB here (read_img's BGR convention, data/util.py:95-109).
    Same interface as PackedImageDataset, so it drops into
    PackedLRHRDataset via the ``reader`` hook.
    """

    def __init__(self, lmdb_path: str):
        lmdb = _require_lmdb()
        self._env = lmdb.open(lmdb_path, readonly=True, lock=False,
                              readahead=False, meminit=False)
        with self._env.begin(write=False) as txn:
            keys = [k.decode('ascii') for k, _ in txn.cursor()]
        self._names = sorted(k for k in keys if not k.endswith('.meta'))

    def __len__(self):
        return len(self._names)

    def read(self, i: int) -> np.ndarray:
        name = self._names[i]
        with self._env.begin(write=False) as txn:
            buf = txn.get(name.encode('ascii'))
            meta = txn.get((name + '.meta').encode('ascii')).decode('ascii')
        h, w, c = [int(s) for s in meta.split(',')]
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
        if c == 1:
            arr = np.repeat(arr, 3, axis=2)
        else:
            arr = arr[:, :, :3][:, :, ::-1]  # BGR (cv2-written) -> RGB
        return np.asarray(arr, dtype=np.float32) / 255.0

    def name(self, i: int) -> str:
        return self._names[i]


def create_lmdb(input_dir: str, out_path: str) -> int:
    """Write every image under input_dir into the reference's lmdb layout
    (scripts/create_lmdb.py equivalent; requires the optional lmdb dep)."""
    lmdb = _require_lmdb()
    from exsr.data.datasets import list_images
    from PIL import Image
    paths = list_images(input_dir)
    # size the map from a DECODED-bytes sample (reference samples 10
    # images, scripts/create_lmdb.py:20-28) instead of decoding the
    # whole set into memory — compressed-size heuristics underestimate
    # badly for high-ratio JPEGs
    sample = paths[:10]
    decoded = [np.asarray(Image.open(p).convert('RGB')).nbytes
               for p in sample]
    est_total = int(np.mean(decoded)) * len(paths)
    env = lmdb.open(out_path, map_size=max(est_total * 4, 1 << 20))
    with env.begin(write=True) as txn:
        for path in paths:
            arr = np.asarray(Image.open(path).convert('RGB'),
                             dtype=np.uint8)[:, :, ::-1]  # BGR like cv2
            base = os.path.splitext(os.path.basename(path))[0]
            h, w, c = arr.shape
            txn.put(base.encode('ascii'), np.ascontiguousarray(arr))
            txn.put((base + '.meta').encode('ascii'),
                    f'{h:d}, {w:d}, {c:d}'.encode('ascii'))
    env.close()
    return len(paths)


class PackedLRHRDataset:
    """LRHR pairs from a packed HR blob with on-the-fly consistent LR
    (drop-in alternative to LRHRDataset for packed data)."""

    def __init__(self, pack_path: str, scale: int,
                 patch_size: int | None = None, train: bool = True,
                 use_flip: bool = True, use_rot: bool = True,
                 registry=None, reader=None):
        if reader is not None:
            self.packed = reader
        elif pack_path.endswith('.lmdb'):
            self.packed = LmdbImageDataset(pack_path)
        else:
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
