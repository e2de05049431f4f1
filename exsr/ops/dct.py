"""Blockwise orthonormal DCT ops for the differentiable JPEG pipeline.

The reference computes the 8x8 (or 16x16 chroma) DCT as explicit cosine-sum
contractions (codes/JPEG_module/JPEG.py:108-127); the normalization there is
exactly the orthonormal DCT-II/DCT-III pair, so here both transforms are a
single einsum against a precomputed orthonormal basis matrix — one fused MXU
matmul per axis on TPU instead of a broadcast cosine reduction.

Layout is TPU-native channels-last: images are NHWC and DCT coefficients are
[N, H/bs, W/bs, bs*bs] (coefficient index = ky*bs + kx, matching the
reference's channel ordering of its [N, 64, h, w] layout).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int = 8) -> np.ndarray:
    """Orthonormal DCT-II basis matrix M with coeffs = M @ x (float64).

    M[k, i] = f_k * cos(pi * k * (2i + 1) / (2n)), f_0 = 1/sqrt(n),
    f_k = sqrt(2/n) — identical normalization to JPEG.py:65-67.
    """
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= 1.0 / np.sqrt(n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def blockize(image: jnp.ndarray, bs: int = 8) -> jnp.ndarray:
    """[N, H, W, 1] image -> [N, H/bs, W/bs, bs, bs] blocks."""
    n, h, w, c = image.shape
    assert c == 1, 'blockize expects single-channel NHWC input'
    x = image.reshape(n, h // bs, bs, w // bs, bs)
    return x.transpose(0, 1, 3, 2, 4)


def unblockize(blocks: jnp.ndarray) -> jnp.ndarray:
    """[N, hb, wb, bs, bs] blocks -> [N, hb*bs, wb*bs, 1] image."""
    n, hb, wb, bsy, bsx = blocks.shape
    x = blocks.transpose(0, 1, 3, 2, 4).reshape(n, hb * bsy, wb * bsx)
    return x[..., None]


def block_dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    """2-D orthonormal DCT-II over the trailing two (bs, bs) dims."""
    m = jnp.asarray(dct_matrix(blocks.shape[-1]), dtype=blocks.dtype)
    return jnp.einsum('ky,qx,...yx->...kq', m, m, blocks)


def block_idct2(coeffs: jnp.ndarray) -> jnp.ndarray:
    """2-D orthonormal DCT-III (inverse of :func:`block_dct2`)."""
    m = jnp.asarray(dct_matrix(coeffs.shape[-1]), dtype=coeffs.dtype)
    return jnp.einsum('ky,qx,...kq->...yx', m, m, coeffs)


def image_to_dct(image: jnp.ndarray, bs: int = 8) -> jnp.ndarray:
    """[N, H, W, 1] -> [N, H/bs, W/bs, bs*bs] DCT coefficients (channels
    last; coefficient c = ky*bs + kx)."""
    n = image.shape[0]
    coeffs = block_dct2(blockize(image, bs))
    return coeffs.reshape(coeffs.shape[:3] + (bs * bs,))


def dct_to_image(coeffs: jnp.ndarray, bs: int = 8) -> jnp.ndarray:
    """Inverse of :func:`image_to_dct`."""
    blocks = coeffs.reshape(coeffs.shape[:3] + (bs, bs))
    return unblockize(block_idct2(blocks))
