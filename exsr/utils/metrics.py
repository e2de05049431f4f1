"""Evaluation metrics: PSNR and SSIM matching the reference exactly.

Reference: utils/util.py:340-391 and metrics/calculate_PSNR_SSIM.py:12-147 —
[0,255] range, float64 accumulation, 11x11 sigma-1.5 gaussian SSIM window
with valid crop, channel-averaged for RGB, border crop of ``scale`` pixels
before computing (test.py:238-242).
"""
from __future__ import annotations

import math

import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    n = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(n ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR on [0, 255] images (utils/util.py:340-347)."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float('inf')
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim_2d(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    window = _gaussian_window()

    from scipy.signal import convolve2d

    def filt(x):
        if x.ndim == 3:
            return np.stack([convolve2d(x[..., c], window, 'valid')
                             for c in range(x.shape[-1])], -1)
        return convolve2d(x, window, 'valid')

    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = filt(img1)
    mu2 = filt(img2)
    sigma1_sq = filt(img1 ** 2) - mu1 ** 2
    sigma2_sq = filt(img2 ** 2) - mu2 ** 2
    sigma12 = filt(img1 * img2) - mu1 * mu2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM on [0, 255] images, MATLAB-compatible (utils/util.py:350-391).

    (The reference's RGB branch calls ssim on the full 3-channel arrays
    three times and averages — identical to one call; we compute once.)
    """
    if img1.shape != img2.shape:
        raise ValueError('Input images must have the same dimensions.')
    if img1.ndim == 3 and img1.shape[2] == 1:
        img1, img2 = img1[..., 0], img2[..., 0]
    return _ssim_2d(img1, img2)


def crop_border(img: np.ndarray, border: int) -> np.ndarray:
    if border == 0:
        return img
    return img[border:-border, border:-border, ...]


def lr_consistency_error(sr: np.ndarray, lr: np.ndarray, scale: int
                         ) -> float:
    """Mean |downscale(SR) − LR| in the valid interior (the reference's
    per-image consistency statistic, test.py:218-236)."""
    from exsr.ops.resize import imresize
    down = imresize(sr, 1.0 / scale)
    m = 4  # conservative interior margin
    return float(np.mean(np.abs(down - lr)[m:-m, m:-m]))
