"""Host-side resize-kernel synthesis and integer-factor resampling conventions.

This is the L0 numeric layer of the framework: everything here runs once at
setup time (numpy, float64) and produces the small constant filters that the
device-side JAX ops (:mod:`exsr.ops.filters`) consume.  Bit-parity with the
reference implementation matters because the CEM consistency guarantee is an
*analytic* property of these exact filter taps.

Reference behavior being reproduced (not copied):
  - bicubic kernel synthesis: /root/reference/codes/CEM/imresize_CEM.py:104-115
    (the reference derives the kernel numerically by cv2-resizing a delta
    image; we derive the identical taps analytically from the Keys cubic with
    a = -0.75, which is what cv2.INTER_CUBIC evaluates — verified by a golden
    test against cv2 in tests/test_resize.py)
  - stride/padding conventions: imresize_CEM.py:89-102 (``calc_strides``)
  - estimated-kernel recentering: imresize_CEM.py:129-175 (``Center_Mass``)
  - integer up/down-sampling with edge or zero padding: imresize_CEM.py:8-87
"""
from __future__ import annotations

import dataclasses
import numpy as np
from scipy.signal import convolve2d

_DELTA_SIZE = 11  # size of the probe delta image used by the reference


def keys_cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (cv2.INTER_CUBIC uses a=-0.75)."""
    x = np.abs(np.asarray(x, dtype=np.float64))
    out = np.zeros_like(x)
    m1 = x <= 1.0
    m2 = (x > 1.0) & (x < 2.0)
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] ** 2 + 1.0
    out[m2] = ((a * x[m2] - 5.0 * a) * x[m2] + 8.0 * a) * x[m2] - 4.0 * a
    return out


def _cv2_cubic_coeffs(t: float) -> np.ndarray:
    """The 4 cubic interpolation weights exactly as cv2 computes them.

    cv2's interpolateCubic evaluates the Keys polynomial (a = -0.75) in
    *float32* and derives the 4th weight as the 1-residual; the reference's
    kernel is a cv2 output (imresize_CEM.py:104-110), so bit-parity requires
    reproducing that arithmetic, not just the math.
    """
    a = np.float32(-0.75)
    t = np.float32(t)
    one = np.float32(1.0)
    c0 = ((a * (t + one) - np.float32(5) * a) * (t + one)
          + np.float32(8) * a) * (t + one) - np.float32(4) * a
    c1 = ((a + np.float32(2)) * t - (a + np.float32(3))) * t * t + one
    u = one - t
    c2 = ((a + np.float32(2)) * u - (a + np.float32(3))) * u * u + one
    c3 = one - c0 - c1 - c2
    return np.array([c0, c1, c2, c3], dtype=np.float64)


def bicubic_upscale_profile(sf: int) -> np.ndarray:
    """1-D tap profile of bicubic upscaling by integer ``sf``.

    Output pixel ``i`` of an ``sf``-times upscale samples source coordinate
    ``fx = (i + 0.5)/sf - 0.5``; a unit impulse at source position ``c``
    receives cv2's cubic weight for tap ``c`` of the 4-tap window around
    ``fx``.  The support is cropped to the nonzero taps, mirroring the
    reference's crop of the cv2-resized delta image (imresize_CEM.py:108-110).
    """
    c = int(np.ceil(_DELTA_SIZE / 2)) - 1  # delta position (5 for size 11)
    taps = np.zeros(sf * _DELTA_SIZE, dtype=np.float64)
    for i in range(sf * _DELTA_SIZE):
        # cv2 computes the source coordinate in double but casts to float32
        # BEFORE splitting into integer/fractional parts — reproduce that.
        fx = np.float32((i + 0.5) * (1.0 / sf) - 0.5)
        sx = int(np.floor(fx))
        tap = c - (sx - 1)  # which of the 4 window taps the delta occupies
        if 0 <= tap <= 3:
            taps[i] = _cv2_cubic_coeffs(np.float32(fx) - np.float32(sx))[tap]
    nz = np.nonzero(taps)[0]
    return taps[nz[0]:nz[-1] + 1]


def bicubic_upscale_kernel_2d(sf: int) -> np.ndarray:
    """2-D separable bicubic upscaling kernel (sums to ``sf**2``)."""
    p = bicubic_upscale_profile(sf)
    return np.outer(p, p)


def calc_strides(shape_hw, factor, align_center: bool = False):
    """Pre/post zero-stuffing offsets for integer-factor resampling.

    For an even factor the single retained sample cannot sit exactly in the
    middle of its ``f``-cell, so a convention is needed; the kernel padding in
    :func:`upscale_kernel_padding` compensates to avoid a net translation.
    Mirrors imresize_CEM.py:89-102 exactly.
    """
    factor = float(factor)
    f = int(np.maximum(factor, 1.0 / factor))
    if align_center:
        mult = factor if factor > 1 else 1.0
        half = np.ceil(np.array(shape_hw[:2], dtype=np.float64) / 2.0 * mult)
        pre = np.mod(half, f)
        pre[pre == 0] = f
        pre = (pre - 1).astype(np.int64)
        post = f - pre - 1
    else:
        post = (np.floor(f / 2) * np.ones(2)).astype(np.int64)
        pre = (f - post - 1).astype(np.int64)
    return pre, post


def upscale_kernel_padding(sf: int):
    """Zero padding applied to the kernel to compensate for stride asymmetry.

    Mirrors imresize_CEM.py:20-22: ``post_pad = max(0, pre - post)``,
    ``pre_pad = max(0, post - pre)`` — one extra row/col for even factors.
    """
    pre, post = calc_strides((0, 0), sf)
    post_pad = np.maximum(0, pre - post)
    pre_pad = np.maximum(0, post - pre)
    return pre_pad, post_pad


def _energy_distribution(filt: np.ndarray) -> np.ndarray:
    """Fraction of filter L2 energy retained when cropping concentric frames.

    Mirrors imresize_CEM.py:177-179.
    """
    energies = [np.sqrt(np.sum(filt ** 2))]
    for m in range(1, int(np.ceil(filt.shape[0] / 2))):
        energies.append(np.sqrt(np.sum(filt[m:-m, m:-m] ** 2)))
    return np.asarray(energies) / energies[0]


def _round_int(v) -> int:
    return int(np.round(v))


def center_mass(kernel: np.ndarray, ds_factor: int) -> np.ndarray:
    """Re-center an (estimated) kernel on its center of mass.

    Pads the kernel so its center of mass lands in the array middle, then
    crops low-energy margins so that ``(size - 1 + (ds_factor+1) % 2)`` is a
    multiple of ``ds_factor``.  Mirrors imresize_CEM.py:129-175.
    """
    assert kernel.shape[0] == kernel.shape[1], 'only square kernels supported'
    ksz = kernel.shape[0]
    xg, yg = np.meshgrid(np.arange(ksz), np.arange(ksz))
    xc = convolve2d(xg, kernel, mode='valid')[0, 0] + 1
    yc = convolve2d(yg, kernel, mode='valid')[0, 0] + 1
    x_pad, y_pad = 2 * (ksz / 2 - xc), 2 * (ksz / 2 - yc)
    padding_diff = np.round(np.abs(y_pad)) - np.round(np.abs(x_pad))
    pre_x, post_x = np.maximum(0, -x_pad), np.maximum(0, x_pad)
    pre_y, post_y = np.maximum(0, -y_pad), np.maximum(0, y_pad)

    def split_extra(pre, post, diff):
        # Decide which side receives the extra (odd) padding, using the
        # rounding quantization error as the tie-breaker.
        offset_right = np.round(post) - post - (np.round(pre) - pre)
        pre, post = _round_int(pre), _round_int(post)
        if offset_right > 0:
            post += int(np.ceil(diff / 2))
            pre += int(np.floor(diff / 2))
        else:
            pre += int(np.ceil(diff / 2))
            post += int(np.floor(diff / 2))
        return pre, post

    if padding_diff > 0:
        pre_y, post_y = _round_int(pre_y), _round_int(post_y)
        pre_x, post_x = split_extra(pre_x, post_x, padding_diff)
    elif padding_diff < 0:
        pre_x, post_x = _round_int(pre_x), _round_int(post_x)
        pre_y, post_y = split_extra(pre_y, post_y, -padding_diff)
    kernel = np.pad(kernel, ((_round_int(pre_y), _round_int(post_y)),
                             (_round_int(pre_x), _round_int(post_x))))
    assert kernel.shape[0] == kernel.shape[1], 'recentering broke squareness'
    margins = np.argwhere(_energy_distribution(kernel) < 0.99)[0][0] \
        * np.ones(2, dtype=np.int64)
    side = 0
    while np.mod(kernel.shape[0] - np.sum(margins) - 1
                 + np.mod(ds_factor + 1, 2), ds_factor) != 0:
        margins[side] -= 1
        side = (side + 1) % 2
    kernel = kernel[margins[0]:-margins[1], margins[0]:-margins[1]]
    return kernel / np.sum(kernel)


class KernelRegistry:
    """Per-scale-factor kernel cache (replaces the reference's function-attr
    global ``imresize.kernels`` — imresize_CEM.py:10)."""

    def __init__(self):
        self._kernels: dict[int, np.ndarray] = {}

    def get(self, sf: int) -> np.ndarray:
        if sf not in self._kernels:
            self._kernels[sf] = bicubic_upscale_kernel_2d(sf)
        return self._kernels[sf]

    def set_estimated(self, sf: int, ds_kernel: np.ndarray) -> None:
        """Register an estimated *downscaling* kernel (e.g. from KernelGAN).

        The registry stores upscaling kernels, so the estimated kernel is
        rotated 180°, recentered, and rescaled to sum ``sf**2``
        (imresize_CEM.py:23-33).
        """
        assert abs(1.0 - np.sum(ds_kernel)) < np.finfo(np.float32).eps, \
            'estimated kernel must sum to 1'
        k = np.rot90(ds_kernel, 2)
        k = center_mass(k, ds_factor=sf) * sf ** 2
        assert k.shape[0] == k.shape[1], 'only square kernels supported'
        pre_pad, post_pad = upscale_kernel_padding(sf)
        assert np.all(np.mod(np.array(k.shape) + post_pad + pre_pad - 1, sf)
                      == 0), 'kernel size must be compatible with sf'
        self._kernels[sf] = k

    def set_blurry_cubic(self, sf: int, sigma: float) -> None:
        """Bicubic kernel convolved with a Gaussian blur
        (imresize_CEM.py:38-42)."""
        self._kernels[sf] = convolve2d(bicubic_upscale_kernel_2d(sf),
                                       gaussian_2d(sigma))

    def reset(self, sf: int) -> None:
        self._kernels[sf] = bicubic_upscale_kernel_2d(sf)


_DEFAULT_REGISTRY = KernelRegistry()


def default_registry() -> KernelRegistry:
    return _DEFAULT_REGISTRY


def padded_upscale_kernel(sf: int, registry: KernelRegistry | None = None
                          ) -> np.ndarray:
    """The upscaling antialiasing kernel, padded per the stride convention.

    Equivalent to ``imresize(..., return_upscale_kernel=True)``
    (imresize_CEM.py:44-48): size 4*sf for even sf (one zero row/col
    prepended), 4*sf-1 for odd sf.  Sums to ``sf**2``.
    """
    registry = registry or _DEFAULT_REGISTRY
    pre_pad, post_pad = upscale_kernel_padding(sf)
    return np.pad(registry.get(sf),
                  ((pre_pad[0], post_pad[0]), (pre_pad[1], post_pad[1])))


def downscale_kernel(sf: int, registry: KernelRegistry | None = None
                     ) -> np.ndarray:
    """The canonical downsampling kernel h (sums to 1).

    Equivalent to ``CEM.CEMnet.Return_kernel`` (CEMnet.py:364-365):
    rot180 of the padded upscale kernel, divided by ``sf**2``.
    """
    k = padded_upscale_kernel(sf, registry)
    return (np.rot90(k, 2) / sf ** 2).astype(np.float64)


def gaussian_2d(sigma: float, size: int | None = None) -> np.ndarray:
    """Normalized 2-D Gaussian holding ≥99% of the 1-D energy
    (imresize_CEM.py:117-124)."""
    from scipy.stats import norm as _norm
    if size is None:
        size = int(1 + 2 * np.ceil(-1 * _norm.ppf(0.005, scale=sigma)))
    else:
        assert size % 2 == 1, 'size must be odd'
    n = np.arange(size) - (size - 1) / 2.0
    g1 = np.exp(-(n ** 2) / (2.0 * sigma ** 2))
    g = np.outer(g1, g1)
    return g / np.sum(g)


def _native_imresize(im, sf, f, kernel, pre_stride):
    """C++ separable fast path (exsr.native); None when not applicable."""
    try:
        from exsr import native
        from exsr.ops.filters import separable_factors
    except ImportError:
        return None
    if not native.available():
        return None
    fac = separable_factors(np.asarray(kernel, np.float64))
    if fac is None:
        return None
    col, row = fac
    squeeze = im.ndim < 3
    img = im[..., None] if squeeze else im
    img = np.asarray(img, np.float64)
    if sf > 1:
        out = native.upscale(img, col, row, f,
                             (int(pre_stride[0]), int(pre_stride[1])))
    else:
        out = native.downscale(img, col, row, f,
                               (int(pre_stride[0]), int(pre_stride[1])))
    return out[..., 0] if squeeze else out


def imresize(im: np.ndarray, scale_factor: float,
             registry: KernelRegistry | None = None,
             use_zero_padding: bool = False,
             align_center: bool = False,
             allow_native: bool = True) -> np.ndarray:
    """Integer-factor resampling of an HWC (or HW) numpy image.

    Host-side oracle used by the data pipeline and tests; the device path is
    :mod:`exsr.ops.filters`.  Mirrors imresize_CEM.py:8-87 for both the
    upscale (zero-stuff then filter) and downscale (filter then subsample)
    directions with 'edge' or zero padding.
    """
    registry = registry or _DEFAULT_REGISTRY
    sf = float(scale_factor)
    f = int(np.maximum(sf, 1.0 / sf))
    pre_stride, post_stride = calc_strides(im.shape, sf, align_center)
    kernel = padded_upscale_kernel(f, registry)
    if sf < 1:
        kernel = np.rot90(kernel * sf ** 2, 2)
    if allow_native and not use_zero_padding and not align_center:
        # correlation with rot180(kernel) == scipy convolution with kernel
        out = _native_imresize(im, sf, f, np.rot90(kernel, 2).copy(),
                               pre_stride)
        if out is not None:
            return out
    pad = np.floor(np.array(kernel.shape) / 2).astype(np.int64)
    squeeze = im.ndim < 3
    if squeeze:
        im = im[..., None]
    desired = (sf * np.array(im.shape[:2])).astype(np.int64)
    assert np.all(sf * np.array(im.shape[:2]) == desired), \
        'downscale factor must divide the image size'

    def filt(x):
        if use_zero_padding:
            return convolve2d(x, kernel, 'same')
        xp = np.pad(x, ((pad[0], pad[0]), (pad[1], pad[1])), mode='edge')
        return convolve2d(xp, kernel, 'valid')

    out = []
    for ch in range(im.shape[2]):
        if sf > 1:
            stuffed = np.zeros(desired, dtype=im.dtype)
            stuffed[pre_stride[0]::f, pre_stride[1]::f] = im[:, :, ch]
            out.append(filt(stuffed))
        else:
            out.append(filt(im[:, :, ch])[pre_stride[0]::f,
                                          pre_stride[1]::f])
    result = np.stack(out, -1)
    return result[..., 0] if squeeze else result


def aliased_downsample(arr: np.ndarray, factor: int) -> np.ndarray:
    """Center-aligned strided subsampling without filtering
    (CEMnet.py:326-332)."""
    pre, _ = calc_strides(arr.shape, 1.0 / factor, align_center=True)
    return arr[pre[0]::factor, pre[1]::factor]


@dataclasses.dataclass(frozen=True)
class ResizeConventions:
    """The full set of conventions for one scale factor, ready for device use."""
    sf: int
    ds_kernel: np.ndarray          # downscaling kernel h, sums to 1
    upscale_kernel: np.ndarray     # h * sf**2 (antialiasing for zero-stuffed)
    pre_stride: np.ndarray         # sample offset within each f-cell
    post_stride: np.ndarray

    @classmethod
    def create(cls, sf: int, registry: KernelRegistry | None = None
               ) -> 'ResizeConventions':
        dsk = downscale_kernel(sf, registry)
        pre, post = calc_strides((0, 0), sf)
        return cls(sf=sf, ds_kernel=dsk, upscale_kernel=dsk * sf ** 2,
                   pre_stride=pre, post_stride=post)
