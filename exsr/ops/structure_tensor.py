"""Image-gradient structure tensors and closed-form 2x2 symmetric SVD.

The explorable-SR latent loss ("L_struct") ties the latent control Z to the
local gradient statistics of the output.  The 2x2 structure tensor
``[[Ix^2, IxIy], [IxIy, Iy^2]]`` is eigendecomposed in closed form, and its
(lambda0, lambda1, theta) maps to/from the 3-channel Z used by the GUI's SVD
sliders.

Reference: codes/models/modules/loss.py:49-62 (gradient filters),
codes/utils/util.py:60-72 (SVD_Symmetric_2x2), util.py:285-291
(SVD_2_LatentZ).  Implementation is pure JAX (NHWC), jit/vmap-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from exsr.ops import filters as F

EPSILON = 1e-30

# 2x2 forward-difference filters (loss.py:51): d/dx and d/dy.
GRAD_X = np.array([[-1.0, 1.0], [0.0, 0.0]])
GRAD_Y = np.array([[-1.0, 0.0], [1.0, 0.0]])


def image_gradients(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel 2x2-difference gradients of an NHWC image.

    VALID correlation with the 2x2 filters — output is [N, H-1, W-1, C],
    matching the reference's unpadded depthwise convs (loss.py:54-62).
    """
    c = x.shape[-1]
    wx = F.depthwise_weights(GRAD_X, c, x.dtype)
    wy = F.depthwise_weights(GRAD_Y, c, x.dtype)
    return (F.depthwise_correlate(x, wx), F.depthwise_correlate(x, wy))


def structure_tensor_elements(x: jnp.ndarray):
    """Per-pixel (Ix^2, Iy^2, Ix*Iy) maps, each [N, H-1, W-1, C]."""
    ix, iy = image_gradients(x)
    return ix * ix, iy * iy, ix * iy


def svd_symmetric_2x2(a: jnp.ndarray, d: jnp.ndarray, b: jnp.ndarray):
    """Closed-form singular values + angle of the symmetric [[a, b], [b, d]].

    Returns (lambda0, lambda1, theta) with lambda0 >= lambda1.  Matches
    utils/util.py:60-72 (SVD_Symmetric_2x2) including the float64 upcast of
    the S1/S2 computation (the reference's FACTOR_4_NUMERIC_ISSUE scaling is
    a no-op in exact arithmetic and is folded away here).
    """
    theta = 0.5 * jnp.arctan2(2 * b * (a + d), a ** 2 - d ** 2)
    a64 = a.astype(jnp.float64) if a.dtype != jnp.float64 else a
    d64 = d.astype(jnp.float64) if d.dtype != jnp.float64 else d
    b64 = b.astype(jnp.float64) if b.dtype != jnp.float64 else b
    s1 = a64 ** 2 + d64 ** 2 + 2 * (b64 ** 2)
    s2 = (a64 + d64) * jnp.sqrt((a64 - d64) ** 2 + (2 * b64) ** 2 + EPSILON)
    lam0 = jnp.sqrt((s1 + s2) / 2 + EPSILON).astype(a.dtype)
    lam1 = jnp.sqrt((s1 - s2) / 2 + EPSILON).astype(a.dtype)
    return lam0, lam1, theta


def valid_struct_tensor(a: jnp.ndarray, d: jnp.ndarray, b: jnp.ndarray
                        ) -> jnp.ndarray:
    """Numerical-validity indicator for the closed-form SVD (loss.py:12-14)."""
    return ((2 * b * (a + d)) ** 2 + (a ** 2 - d ** 2) ** 2) > EPSILON


def svd_to_latent_z(lambda0: jnp.ndarray, lambda1: jnp.ndarray,
                    theta: jnp.ndarray, max_lambda: float = 1.0
                    ) -> jnp.ndarray:
    """Map (lambda0, lambda1, theta) slider controls to 3-channel Z.

    Matches utils/util.py:285-291 (SVD_2_LatentZ): lambda in [0, max_lambda]
    is mapped to [-max_lambda, max_lambda]; channels stacked last (NHWC):
    (Sigma Ix^2, Sigma Iy^2, Sigma IxIy).
    """
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([
        2 * max_lambda * (lambda1 * s ** 2 + lambda0 * c ** 2) - max_lambda,
        2 * max_lambda * (lambda0 * s ** 2 + lambda1 * c ** 2) - max_lambda,
        2 * (lambda0 - lambda1) * s * c,
    ], axis=-1)
