"""Color-space conversions matching the reference (MATLAB conventions).

Reference: data/util.py:150-216 (rgb2ycbcr/ycbcr2rgb) and
utils/util.py:328-330 (tensor variants).  uint8 inputs stay [0,255] and get
rounded; float inputs are treated as [0,1].
"""
from __future__ import annotations

import numpy as np

_RGB2YCBCR = np.array([[65.481, -37.797, 112.0],
                       [128.553, -74.203, -93.786],
                       [24.966, 112.0, -18.214]])
_YCBCR2RGB = np.array([[0.00456621, 0.00456621, 0.00456621],
                       [0, -0.00153632, 0.00791071],
                       [0.00625893, -0.00318811, 0]])


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    if only_y:
        out = x @ np.array([65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        out = x @ _RGB2YCBCR / 255.0 + np.array([16.0, 128.0, 128.0])
    if in_type == np.uint8:
        return out.round().astype(np.uint8)
    return (out / 255.0).astype(in_type)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    out = x @ _YCBCR2RGB * 255.0 + np.array([-222.921, 135.576, -276.836])
    if in_type == np.uint8:
        return out.round().astype(np.uint8)
    return (out / 255.0).astype(in_type)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop so both spatial dims are multiples of scale
    (data/util.py:218-231)."""
    h, w = img.shape[:2]
    return img[:h - h % scale, :w - w % scale, ...]


def tensor2img(x, min_max=(0.0, 1.0)) -> np.ndarray:
    """[N,H,W,C] or [H,W,C] float array in min_max -> uint8 HWC image
    (utils/util.py:196-228 semantics, NHWC layout)."""
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip((arr - min_max[0]) / (min_max[1] - min_max[0]), 0, 1)
    return (arr * 255.0).round().astype(np.uint8)
