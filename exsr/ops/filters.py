"""Device-side (JAX/XLA) depthwise filtering primitives.

These are the hot ops of the CEM consistency chain — depthwise 2-D filtering
with replicate padding, zero-stuffing upsampling, and aliased downsampling.
All tensors are NHWC (TPU-native layout).  Convs are expressed as
``lax.conv_general_dilated`` so XLA can tile them onto the MXU and fuse the
surrounding elementwise work.

Semantics mirror the reference's filter ops (CEMnet.py:243-275), but the
implementation is TPU-first: correlation (like torch's conv2d) with
pre-transposed HWIO depthwise weights, NHWC throughout, no Python loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ('NHWC', 'HWIO', 'NHWC'))


def depthwise_weights(kernel2d: np.ndarray | jnp.ndarray, channels: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Tile a 2-D kernel into HWIO depthwise-conv weights [kh, kw, 1, C]."""
    k = jnp.asarray(kernel2d, dtype=dtype)
    return jnp.tile(k[:, :, None, None], (1, 1, 1, channels))


def replicate_pad(x: jnp.ndarray, pad_h: int, pad_w: int | None = None
                  ) -> jnp.ndarray:
    """Replicate (edge) padding of an NHWC tensor's spatial dims."""
    if pad_w is None:
        pad_w = pad_h
    return jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                   mode='edge')


def depthwise_correlate(x: jnp.ndarray, weights: jnp.ndarray,
                        padding='VALID',
                        precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Depthwise cross-correlation (torch conv2d semantics) on NHWC input.

    ``weights`` must be HWIO with I==1 and O==C (from
    :func:`depthwise_weights`).  Defaults to HIGHEST precision: on TPU the
    MXU otherwise truncates to bfloat16, which would break the CEM's
    bit-accuracy guarantee (~1e-3 error in the consistency chain).
    """
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, weights.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=_DN, feature_group_count=c, precision=precision)


def filter_replicate_same(x: jnp.ndarray, weights: jnp.ndarray
                          ) -> jnp.ndarray:
    """Depthwise correlation with replicate padding to 'same' size.

    Equivalent to the reference's ``Filter_Layer`` with a ReplicationPad2d
    pre-pad (CEMnet.py:243-252,262-264): pad = floor(k/2) on each side, so an
    even kernel grows the output by one pixel relative to the input (matching
    torch's ReplicationPad2d + VALID conv arithmetic).
    """
    kh, kw = weights.shape[0], weights.shape[1]
    return depthwise_correlate(replicate_pad(x, kh // 2, kw // 2), weights)


def zero_stuff(x: jnp.ndarray, f: int, pre: tuple[int, int]) -> jnp.ndarray:
    """Zero-stuffing upsample: each pixel lands at sub-position ``pre`` of its
    f×f cell (CEMnet.py:268-269 / imresize_CEM.py:70-72)."""
    n, h, w, c = x.shape
    out = jnp.zeros((n, h, f, w, f, c), dtype=x.dtype)
    out = out.at[:, :, pre[0], :, pre[1], :].set(x)
    return out.reshape(n, h * f, w * f, c)


def aliased_subsample(x: jnp.ndarray, f: int, pre: tuple[int, int]
                      ) -> jnp.ndarray:
    """Strided subsampling at sub-position ``pre`` of each f×f cell
    (CEMnet.py:273-274)."""
    return x[:, pre[0]::f, pre[1]::f, :]


@functools.partial(jax.jit, static_argnames=('f', 'pre'))
def upscale_op(x: jnp.ndarray, weights: jnp.ndarray, f: int,
               pre: tuple[int, int]) -> jnp.ndarray:
    """Consistent upscale: zero-stuff then antialias-filter (replicate pad).

    Equivalent to CEM_PyTorch's ``Upscale_OP`` (CEMnet.py:265-272).  The
    replicate pad acts on the *stuffed* tensor, exactly as in the reference
    (for f ≥ 3 the stuffed borders are zero rows, so this equals zero pad;
    for f = 2 the pixel row is at the border and genuinely replicates).
    """
    return filter_replicate_same(zero_stuff(x, f, pre), weights)


@functools.partial(jax.jit, static_argnames=('f', 'pre'))
def downscale_op(x: jnp.ndarray, weights: jnp.ndarray, f: int,
                 pre: tuple[int, int]) -> jnp.ndarray:
    """Consistent downscale: antialias-filter (replicate pad) then subsample.

    Equivalent to CEM_PyTorch's ``DownscaleOP`` (CEMnet.py:275).  ``weights``
    must already hold rot180(h) so that correlation == convolution with h.
    """
    return aliased_subsample(filter_replicate_same(x, weights), f, pre)


def separable_factors(kernel2d: np.ndarray, tol: float = 1e-10):
    """Rank-1 factorization k = outer(v, h) if the 2-D kernel is (numerically)
    separable, else None.

    The CEM's bicubic kernels are exact outer products, and inv_hTh of a
    separable filter is itself exactly separable (the Fourier-domain
    inverse of an outer product is an outer product), so the entire CEM
    filter chain reduces to 1-D depthwise convs — ~k/2 times fewer VPU ops
    than the 2-D depthwise form.
    """
    k = np.asarray(kernel2d, dtype=np.float64)
    u, s, vt = np.linalg.svd(k)
    if s[0] == 0 or (len(s) > 1 and s[1] > tol * s[0]):
        return None
    col = u[:, 0] * np.sqrt(s[0])
    row = vt[0] * np.sqrt(s[0])
    # canonical sign: both factors non-negative-sum (SVD sign is arbitrary;
    # flipping both leaves the outer product unchanged)
    if col.sum() < 0 and row.sum() < 0:
        col, row = -col, -row
    if not np.allclose(np.outer(col, row), k,
                       atol=10 * tol * max(abs(s[0]), 1.0)):
        return None
    return col, row


def depthwise_weights_1d(taps: np.ndarray, channels: int, axis: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    """HWIO weights for a 1-D depthwise filter along H (axis=0) or W."""
    t = np.asarray(taps, np.float64)
    k2 = t[:, None] if axis == 0 else t[None, :]
    return depthwise_weights(k2, channels, dtype)


def filter_replicate_same_separable(x: jnp.ndarray, w_col: jnp.ndarray,
                                    w_row: jnp.ndarray) -> jnp.ndarray:
    """Separable version of :func:`filter_replicate_same`.

    Replicate padding commutes across the two 1-D passes (edge-padding W
    replicates columns, which the H-conv maps to the H-conv of those
    columns), so the result is bit-equivalent to the 2-D filter up to fp
    summation order.
    """
    kh = w_col.shape[0]
    kw = w_row.shape[1]
    x = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (0, 0), (0, 0)),
                mode='edge')
    x = depthwise_correlate(x, w_col)
    x = jnp.pad(x, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)),
                mode='edge')
    return depthwise_correlate(x, w_row)


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of NHWC with half-pixel centers (antialias off).

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False)``, used for the HR→LR latent-map downscale in the
    generator (architecture.py:284) and D-side latent resize
    (architecture.py:196).
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_h, out_w, c), method='bilinear',
                            antialias=False)


def nearest_upsample(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Nearest-neighbor upsample of NHWC by integer factor ``f``.

    Matches ``torch.nn.functional.interpolate(mode='nearest')`` used in the
    generator's upconv blocks (block.py:293-309).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, f, w, f, c))
    return x.reshape(n, h * f, w * f, c)
