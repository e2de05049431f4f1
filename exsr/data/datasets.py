"""Datasets + input pipeline — host-parallel, TPU-feeding.

Reference: codes/data/ (LRHR_dataset.py, LR_dataset.py, JPEG_dataset.py,
data/__init__.py).  Same capabilities, re-designed for TPU feeding:

  * image-folder datasets (lmdb is gated: unavailable in this image);
  * on-the-fly consistent LR synthesis through the CEM's own resize kernels
    (LRHR_dataset.py:87) so training pairs are exactly consistent;
  * LR-aligned random crops, flip/rot augmentation (LRHR_dataset.py:108-115);
  * JPEG dataset: grayscale-Y or YCbCr crops with per-sample quality factors
    drawn from weighted lists/ranges, deterministic QF schedule at eval
    (JPEG_dataset.py:28-77);
  * a threaded prefetching loader producing NHWC numpy batches, with
    per-host batch slicing for multi-host meshes (the DataLoader-workers
    equivalent; device transfer happens in the train loop via the sharding
    rules).
"""
from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from exsr.ops.resize import imresize, KernelRegistry
from exsr.utils.color import modcrop, rgb2ycbcr

IMG_EXTENSIONS = ('.png', '.jpg', '.jpeg', '.bmp', '.ppm', '.tif', '.tiff')


def list_images(root: str) -> list[str]:
    assert os.path.isdir(root), f'{root} is not a directory'
    paths = []
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTENSIONS):
                paths.append(os.path.join(dirpath, f))
    assert paths, f'{root} contains no images'
    return paths


def read_img(path: str) -> np.ndarray:
    """float32 HWC RGB in [0, 1] (data/util.py:95-109, sans BGR quirk)."""
    from PIL import Image
    img = np.asarray(Image.open(path).convert('RGB'), dtype=np.float32)
    return img / 255.0


def augment(imgs: Sequence[np.ndarray], hflip: bool, vflip: bool,
            rot90: bool) -> list[np.ndarray]:
    """Joint flip/rotate augmentation (data/util.py:118-136)."""
    out = []
    for img in imgs:
        if hflip:
            img = img[:, ::-1, :]
        if vflip:
            img = img[::-1, :, :]
        if rot90:
            img = img.transpose(1, 0, 2)
        out.append(np.ascontiguousarray(img))
    return out


@dataclasses.dataclass
class LRHRDataset:
    """Paired (or synthesized) LR/HR image dataset (LRHR_dataset.py:11-134).

    If ``lr_root`` is None, LR is synthesized on the fly by the CEM's
    consistent downscale so pairs are exactly consistent.
    """
    hr_root: str
    scale: int
    lr_root: str | None = None
    patch_size: int | None = None       # HR patch (train) or None (eval)
    use_flip: bool = True
    use_rot: bool = True
    train: bool = True
    registry: KernelRegistry | None = None
    # In-memory cache of the decoded full (hr, lr) pairs, byte-budgeted.
    # Without it every access re-decodes the PNG AND re-runs the CEM
    # downscale — measured ~97% of a small-config train step is host
    # overhead, much of it here (the reference solves the same problem
    # with its lmdb path, LRHR_dataset.py:20-37).  0 disables.
    cache_bytes: int = 1 << 30

    def __post_init__(self):
        self.hr_paths = list_images(self.hr_root)
        self.lr_paths = list_images(self.lr_root) if self.lr_root else None
        if self.lr_paths:
            assert len(self.lr_paths) == len(self.hr_paths)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cache_used = 0

    def __len__(self):
        return len(self.hr_paths)

    def _full_pair(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(idx)
        if hit is not None:
            return hit
        hr = modcrop(read_img(self.hr_paths[idx]), self.scale)
        if self.lr_paths:
            lr = read_img(self.lr_paths[idx])
        else:
            lr = imresize(hr, 1.0 / self.scale, registry=self.registry)
        sz = hr.nbytes + lr.nbytes
        if self._cache_used + sz <= self.cache_bytes:
            # no eviction: training accesses are uniform-random, so once
            # the budget is full, swapping entries buys nothing
            self._cache[idx] = (hr, lr)
            self._cache_used += sz
        return hr, lr

    def __getitem__(self, idx: int, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        hr, lr = self._full_pair(idx)
        if self.train and self.patch_size:
            ps = self.patch_size
            lps = ps // self.scale
            h, w = lr.shape[:2]
            assert h >= lps and w >= lps, \
                f'image {self.hr_paths[idx]} smaller than patch'
            y = int(rng.integers(0, h - lps + 1))
            x = int(rng.integers(0, w - lps + 1))
            lr = lr[y:y + lps, x:x + lps]
            hr = hr[y * self.scale:(y + lps) * self.scale,
                    x * self.scale:(x + lps) * self.scale]
            if self.use_flip or self.use_rot:
                hf = self.use_flip and rng.random() < 0.5
                vf = self.use_flip and rng.random() < 0.5
                rot = self.use_rot and rng.random() < 0.5
                lr, hr = augment([lr, hr], hf, vf, rot)
        return {'lr': lr.astype(np.float32), 'hr': hr.astype(np.float32),
                'path': self.hr_paths[idx]}


@dataclasses.dataclass
class LRDataset:
    """LR-only dataset for real images without ground truth
    (LR_dataset.py:8-51)."""
    lr_root: str

    def __post_init__(self):
        self.lr_paths = list_images(self.lr_root)

    def __len__(self):
        return len(self.lr_paths)

    def __getitem__(self, idx: int, rng=None):
        return {'lr': read_img(self.lr_paths[idx]).astype(np.float32),
                'path': self.lr_paths[idx]}


@dataclasses.dataclass
class JPEGDataset:
    """Uncompressed crops + per-sample JPEG quality factors
    (JPEG_dataset.py:12-158).

    ``qf_spec``: list of (qf_or_range, probability) — a range is an
    inclusive (lo, hi) tuple.  Eval mode cycles QFs deterministically
    (JPEG_dataset.py:61-77).
    """
    root: str
    patch_size: int = 256
    chroma: bool = False
    qf_spec: Sequence = ((10, 1.0),)
    train: bool = True
    min_image_size: int | None = None

    def __post_init__(self):
        self.paths = list_images(self.root)
        if self.min_image_size:
            kept = []
            from PIL import Image
            for p in self.paths:
                with Image.open(p) as im:
                    if min(im.size) >= self.min_image_size:
                        kept.append(p)
            self.paths = kept
        probs = np.array([p for _, p in self.qf_spec], dtype=np.float64)
        self._probs = probs / probs.sum()

    def __len__(self):
        return len(self.paths)

    def _sample_qf(self, idx: int, rng: np.random.Generator) -> int:
        if self.train:
            choice = rng.choice(len(self.qf_spec), p=self._probs)
            spec = self.qf_spec[choice][0]
            if isinstance(spec, (tuple, list)):
                return int(rng.integers(spec[0], spec[1] + 1))
            return int(spec)
        # deterministic schedule at eval: cycle the spec means
        vals = [int(np.mean(s)) if isinstance(s, (tuple, list)) else int(s)
                for s, _ in self.qf_spec]
        return vals[idx % len(vals)]

    def __getitem__(self, idx: int, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        img = read_img(self.paths[idx])
        ycbcr = rgb2ycbcr(img.astype(np.float32), only_y=not self.chroma)
        if not self.chroma:
            ycbcr = ycbcr[..., None] if ycbcr.ndim == 2 else ycbcr
        ps = self.patch_size
        h, w = ycbcr.shape[:2]
        if self.train:
            y = int(rng.integers(0, max(h - ps, 0) + 1))
            x = int(rng.integers(0, max(w - ps, 0) + 1))
        else:
            y, x = max(0, (h - ps) // 2), max(0, (w - ps) // 2)
        crop = ycbcr[y:y + ps, x:x + ps]
        if crop.shape[0] < ps or crop.shape[1] < ps:
            crop = np.pad(crop, ((0, ps - crop.shape[0]),
                                 (0, ps - crop.shape[1]), (0, 0)),
                          mode='edge')
        return {'uncomp': (255.0 * crop).astype(np.float32),
                'qf': np.int32(self._sample_qf(idx, rng)),
                'path': self.paths[idx]}


class DataLoader:
    """Threaded, seeded, prefetching batch iterator -> NHWC numpy batches.

    Replaces torch DataLoader+workers (data/__init__.py:4-17).  Train mode
    shuffles per epoch and drops the last partial batch.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_threads: int = 4, prefetch: int = 4,
                 drop_last: bool = True):
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f'dataset has {len(dataset)} items < batch_size '
                f'{batch_size}: with drop_last every epoch would be empty '
                f'(the train loop would spin forever)')
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        indices = self._epoch_indices(epoch)
        n_batches = len(self)
        work: 'queue.Queue' = queue.Queue()
        done: dict[int, dict] = {}
        lock = threading.Lock()
        cv = threading.Condition(lock)

        for b in range(n_batches):
            work.put(b)

        def collate(batch_idx):
            rng = np.random.default_rng(
                (self.seed, epoch, batch_idx))
            items = [self.dataset.__getitem__(int(i), rng=rng)
                     for i in indices[batch_idx * self.batch_size:
                                      (batch_idx + 1) * self.batch_size]]
            out = {}
            for k in items[0]:
                if k == 'path':
                    out[k] = [it[k] for it in items]
                else:
                    out[k] = np.stack([it[k] for it in items])
            return out

        def worker():
            while True:
                try:
                    b = work.get_nowait()
                except queue.Empty:
                    return
                batch = collate(b)
                with cv:
                    done[b] = batch
                    cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()
        for b in range(n_batches):
            with cv:
                while b not in done:
                    cv.wait()
                batch = done.pop(b)
            yield batch

    def stream(self, start_epoch: int = 0) -> Iterator[dict]:
        """Continuous cross-epoch batch stream.

        ``epoch()`` can only prefetch *within* one epoch — with a tiny
        tile dataset an epoch holds a single batch, so nothing ever
        overlaps device compute and the train loop pays the full collate
        latency every step (measured 0.3–0.8 s/step of exposed t_data on
        the r5 flagship run; the reference's torch DataLoader has the
        same per-epoch worker restart).  A background producer keeps up
        to ``prefetch`` collated batches ready across epoch boundaries;
        epoch seeds/shuffling are identical to sequential ``epoch(e)``
        calls, so resume determinism is unchanged."""
        out: 'queue.Queue' = queue.Queue(maxsize=max(1, self.prefetch))

        def produce():
            e = start_epoch
            while True:
                for batch in self.epoch(e):
                    out.put(batch)
                e += 1

        threading.Thread(target=produce, daemon=True).start()
        while True:
            yield out.get()
