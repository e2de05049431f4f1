"""Training losses — pure jittable functions (reference: loss.py).

* GAN losses (vanilla / lsgan / wgan) with optional hinge clamp —
  loss.py:212-246.
* Range loss (mean deviation outside the legitimate range) — loss.py:248-258.
* WGAN gradient penalty via jax.grad through the critic — loss.py:260-279.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def gan_loss(gan_type: str, pred: jnp.ndarray, target_is_real: bool,
             hinge_threshold: float | None = None) -> jnp.ndarray:
    """D/G adversarial loss on raw critic outputs (loss.py:212-246)."""
    if hinge_threshold is not None:
        pred = (jnp.minimum(pred, hinge_threshold) if target_is_real
                else jnp.maximum(pred, -hinge_threshold))
    if gan_type == 'vanilla':
        labels = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
        return optax.sigmoid_binary_cross_entropy(pred, labels).mean()
    if gan_type == 'lsgan':
        labels = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
        return jnp.mean((pred - labels) ** 2)
    if 'wgan' in gan_type:
        return -pred.mean() if target_is_real else pred.mean()
    raise NotImplementedError(f'GAN type [{gan_type}] is not found')


def range_loss(x: jnp.ndarray, legit_range=(0.0, 1.0),
               chroma_mode: bool = False) -> jnp.ndarray:
    """Mean deviation outside [lo, hi] across all pixels (loss.py:248-258)."""
    lo, hi = legit_range
    if chroma_mode:
        x = x[..., 1:]
    return jnp.maximum(jnp.maximum(x - hi, 0.0),
                       jnp.maximum(lo - x, 0.0)).mean()


def gradient_penalty(d_apply: Callable, real: jnp.ndarray,
                     fake: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """WGAN-GP: ((||grad_x D(x_interp)||_2 - 1)^2).mean (loss.py:260-279).

    ``d_apply(x) -> critic scores``; gradients via jax.grad of the summed
    critic output (equivalent to grad_outputs=ones).
    """
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1),
                               dtype=real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake
    grads = jax.grad(lambda x: d_apply(x).sum())(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2,
                             axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).mean()


def l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def masked_l1(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray
              ) -> jnp.ndarray:
    """L1 over a CEM loss mask (Mask_Invalid_Regions, CEMnet.py:89-91)."""
    return jnp.abs(mask * (a - b)).mean()
