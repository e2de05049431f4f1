"""Pallas TPU kernel: fused separable edge-padded depthwise filter.

The CEM consistency chain applies three separable filters per enforce()
(inv_hTh at LR, antialias at HR up/down).  The XLA lowering materializes
the edge-padded intermediate of each 1-D pass in HBM; this kernel keeps the
whole per-image tile resident in VMEM and runs both passes (column taps
then row taps) as VPU shifted multiply-adds — one HBM read and one write
per image.

Grid: one program per batch element (a full LR/HR image tile comfortably
fits the ~16 MB VMEM for this workload's shapes; e.g. 512x512x3 fp32 = 3 MB
plus one scratch of the same size).

Edge ('replicate') padding is realized with clamped shifted slices instead
of materialized pads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_rows_edge(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    """x[[clamp(i + offset)], :, :] with edge clamping (H axis)."""
    h = x.shape[0]
    if offset == 0:
        return x
    if offset > 0:
        body = x[offset:, :, :]
        edge = jnp.broadcast_to(x[h - 1:h, :, :],
                                (offset,) + x.shape[1:])
        return jnp.concatenate([body, edge], axis=0)
    body = x[:h + offset, :, :]
    edge = jnp.broadcast_to(x[0:1, :, :], (-offset,) + x.shape[1:])
    return jnp.concatenate([edge, body], axis=0)


def _shift_cols_edge(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Edge-clamped shift along W."""
    w = x.shape[1]
    if offset == 0:
        return x
    if offset > 0:
        body = x[:, offset:, :]
        edge = jnp.broadcast_to(x[:, w - 1:w, :],
                                x.shape[:1] + (offset,) + x.shape[2:])
        return jnp.concatenate([body, edge], axis=1)
    body = x[:, :w + offset, :]
    edge = jnp.broadcast_to(x[:, 0:1, :],
                            x.shape[:1] + (-offset,) + x.shape[2:])
    return jnp.concatenate([edge, body], axis=1)


def _sepfilter_kernel(kcol: tuple[float, ...], krow: tuple[float, ...],
                      x_ref, out_ref, scratch):
    x = x_ref[0]  # block [1, H, W, C] -> [H, W, C]
    rc = len(kcol) // 2
    acc = jnp.zeros_like(x)
    for t, kv in enumerate(kcol):
        acc = acc + jnp.float32(kv) * _shift_rows_edge(x, t - rc)
    scratch[0] = acc
    y = scratch[0]
    rr = len(krow) // 2
    acc2 = jnp.zeros_like(y)
    for t, kv in enumerate(krow):
        acc2 = acc2 + jnp.float32(kv) * _shift_cols_edge(y, t - rr)
    out_ref[0] = acc2


@functools.partial(jax.jit, static_argnames=('kcol', 'krow', 'interpret'))
def sepfilter_edge_pallas(x: jnp.ndarray, kcol: tuple[float, ...],
                          krow: tuple[float, ...],
                          interpret: bool = False) -> jnp.ndarray:
    """[B, H, W, C] fp32 -> same shape; separable edge-padded correlation.

    Equivalent to exsr.ops.filters.filter_replicate_same_separable for odd
    tap counts (the CEM's inv_hTh and odd-factor kernels); taps are static
    Python floats baked into the kernel.
    """
    b, h, w, c = x.shape
    kernel = functools.partial(_sepfilter_kernel, kcol, krow)
    flops = 2 * (len(kcol) + len(krow)) * h * w * c
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((1, h, w, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops * b,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x)
