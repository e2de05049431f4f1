"""Mask-driven patch extraction for local Z-edit objectives.

The reference extracts overlapping patches from a masked region with a giant
sparse matrix multiply (Z_optimization.py:232-271) — sparse matmuls have no
efficient TPU analogue.  Here the host precomputes the flat pixel indices of
each valid patch once per mask ([P, patch_size**2] int32), and the device
gathers them with one ``jnp.take`` — a dense, static-shape gather XLA turns
into an efficient dynamic-gather.

Selection semantics mirror the reference exactly: binary-opening of the mask
by a patch-size square, sliding-window candidate patches fully inside the
mask, then greedy row-major dropping of patches whose pixels are already
covered beyond the overlap fraction (Z_optimization.py:238-253).
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import binary_opening

import jax.numpy as jnp


def patch_indices_from_mask(mask: np.ndarray, patch_size: int,
                            patches_overlap: float = 1.0,
                            return_non_covered: bool = False):
    """Flat pixel indices of valid patches: int32 [P, patch_size**2].

    ``patches_overlap``: maximal allowed fraction of a candidate patch's
    pixels already covered by previously accepted patches (1 = keep all).
    With ``return_non_covered``, also returns the flat indices of masked
    pixels not covered by any accepted patch (or None).
    """
    mask = binary_opening(mask.astype(bool),
                          np.ones([patch_size, patch_size], dtype=bool))
    h, w = mask.shape
    ids = np.arange(mask.size).reshape(mask.shape)
    # sliding-window candidate patches (top-left anchored)
    ph = h - patch_size + 1
    pw = w - patch_size + 1
    if ph <= 0 or pw <= 0:
        empty = np.zeros((0, patch_size ** 2), np.int32)
        return (empty, None) if return_non_covered else empty
    win_ids = np.lib.stride_tricks.sliding_window_view(
        ids, (patch_size, patch_size)).reshape(-1, patch_size ** 2)
    win_valid = np.lib.stride_tricks.sliding_window_view(
        mask, (patch_size, patch_size)).reshape(-1, patch_size ** 2)
    candidates = win_ids[np.all(win_valid, axis=1)]
    if patches_overlap < 1 and len(candidates):
        taken = np.zeros(mask.size, dtype=bool)
        keep = np.ones(len(candidates), dtype=bool)
        for i, patch in enumerate(candidates):
            covered = taken[patch]
            if (patches_overlap == 0 and covered.any()) or \
                    covered.mean() > patches_overlap:
                keep[i] = False
                continue
            taken[patch] = True
        candidates = candidates[keep]
    else:
        taken = np.zeros(mask.size, dtype=bool)
        if len(candidates):
            taken[candidates.reshape(-1)] = True
    out = candidates.astype(np.int32)
    if return_non_covered:
        masked = np.flatnonzero(mask.reshape(-1))
        non_covered = masked[~taken[masked]].astype(np.int32)
        return out, (non_covered if non_covered.size else None)
    return out


def gather_patches(img_2d: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """[H*W] or [H, W] image -> [P, patch_size**2] patch matrix."""
    return jnp.take(img_2d.reshape(-1), indices, axis=0)


def masked_patch_std(img_gray: jnp.ndarray, indices: jnp.ndarray,
                     non_covered: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-patch STD over masked patches of a [H, W] grayscale image, plus
    (optionally) the STD of the leftover non-covered pixels — the reference's
    Masked_STD in 'local' mode (Z_optimization.py:616-627)."""
    patches = gather_patches(img_gray, indices)          # [P, k*k]
    stds = jnp.std(patches, axis=1, ddof=1)
    if non_covered is not None:
        extra = jnp.std(jnp.take(img_gray.reshape(-1), non_covered),
                        ddof=1)
        stds = jnp.concatenate([stds, extra[None]])
    return stds
