"""Pallas TPU kernel: the RDB stage-4 epilogue as one fused device op.

Trace finding (PROFILE_r03.json): in the grouped trunk the stage-4
fusion — conv(c3, w4[gc->nf]) + gather of four nf-wide partials + bias +
0.2-residual — runs at ~24 TF/s (3.9 ms/RDB at b128) while the wide group
convs hit 86-152 TF/s: XLA serializes the narrow MXU conv and the
HBM-bandwidth-bound partial adds.  This kernel overlaps them: the grid
pipelines per-image DMA of the partial buffers while the MXU runs the
conv, targeting max(bytes_time ~2.1 ms, matmul ~1.0 ms) instead of their
sum.

Math (bit-equal to _rdb_grouped's tail, exsr/models/rrdb_fast.py):
    out = 0.2 * (conv3x3_SAME(c3, w4) + b4 + p0 + p1 + p2 + p3) + x
with p_g = P[g][..., :nf] (s4-first packing).  The 3x3 conv uses the
zero-bordered-buffer + static-row-shift approach of rrdb_block.py, but
with the three KY taps fused into K=3*gc dots (three dots per conv
instead of nine) and the W-taps realized by fp32 pltpu.roll (Mosaic:
lane-dim slice starts must be aligned; rolls are 32-bit only).

Mosaic compile-service limits (verify SKILL.md): this kernel is ~10x
smaller than the rejected whole-RDB kernel (3 dots vs 45), inside what
the remote compiler handles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nf, gc, h, w, c3_ref, p0_ref, p1_ref, p2_ref, p3_ref, x_ref,
            w4_ref, b4_ref, out_ref, buf_ref, col_ref, acc_ref):
    # p refs may carry extra trailing channels (Mosaic blocks must be
    # 128-divisible or full-width on the lane dim); the s4 part is the
    # leading nf channels (s4-first packing)
    # zero-bordered c3 for the SAME conv
    buf_ref[:] = jnp.zeros_like(buf_ref)
    buf_ref[1:h + 1, 1:w + 1, :] = c3_ref[0]
    # fuse the three KY taps: col[y, x, 3*gc] = (c3[y], c3[y+1], c3[y+2])
    for ky in range(3):
        col_ref[:, :, ky * gc:(ky + 1) * gc] = buf_ref[ky:ky + h, :, :]
    _stage4_core(nf, gc, h, w, p0_ref, p1_ref, p2_ref, p3_ref, x_ref,
                 w4_ref, b4_ref, out_ref, col_ref, acc_ref)


def _kernel_prepad(nf, gc, h, w, c3p_ref, p0_ref, p1_ref, p2_ref, p3_ref,
                   x_ref, w4_ref, b4_ref, out_ref, col_ref, acc_ref):
    # chunked variant: c3p arrives pre-padded (zero border + neighbour-row
    # halo), so no in-kernel border buffer — dim-0 slices only
    for ky in range(3):
        col_ref[:, :, ky * gc:(ky + 1) * gc] = c3p_ref[0, ky:ky + h, :, :]
    _stage4_core(nf, gc, h, w, p0_ref, p1_ref, p2_ref, p3_ref, x_ref,
                 w4_ref, b4_ref, out_ref, col_ref, acc_ref)


def _stage4_core(nf, gc, h, w, p0_ref, p1_ref, p2_ref, p3_ref, x_ref,
                 w4_ref, b4_ref, out_ref, col_ref, acc_ref):
    # one dot per W tap (K = 3*gc), horizontal shift via fp32 roll
    col = col_ref[:].reshape(h * (w + 2), 3 * gc)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dx in range(3):
        wt = w4_ref[dx]  # [3*gc, nf] — taps (ky, dx) stacked along K
        y = jax.lax.dot_general(
            col, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(h, w + 2, nf)
        if dx > 0:
            y = pltpu.roll(y, shift=w + 2 - dx, axis=1)
        acc_ref[:] += y[:, 0:w, :].reshape(h * w, nf)
    dt = x_ref.dtype
    conv = acc_ref[:].reshape(h, w, nf) + b4_ref[:]
    partial = (p0_ref[0, :, :, :nf].astype(jnp.float32)
               + p1_ref[0, :, :, :nf].astype(jnp.float32)
               + p2_ref[0, :, :, :nf].astype(jnp.float32)
               + p3_ref[0, :, :, :nf].astype(jnp.float32))
    out_ref[0] = ((conv + partial) * 0.2).astype(dt) + x_ref[0]


@functools.partial(jax.jit, static_argnames=('interpret',))
def stage4_pallas(c3, p0, p1, p2, p3, x, w4, b4, interpret: bool = False):
    """out = 0.2*(conv3x3(c3, w4) + b4 + Σ p_g[...,:nf]) + x.

    ``p_g`` are the FULL P buffers (s4-first layout); the BlockSpec picks
    their leading nf-wide channel block, so no slice op materializes.
    ``w4`` is HWIO [3, 3, gc, nf]; ``b4`` [nf] fp32.
    """
    b, h, w, gc = c3.shape
    nf = x.shape[-1]
    # [dx, (ky, gc), nf]: K-stacked taps matching the col buffer layout
    w4_k = jnp.transpose(w4, (1, 0, 2, 3)).reshape(3, 3 * gc, nf) \
        .astype(c3.dtype)

    img = lambda ch: pl.BlockSpec((1, h, w, ch), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)

    def pspec(p):
        # lane-dim blocks must be 128-divisible or the full width; bring
        # the leading 128 channels when the buffer is wider (they cover
        # the nf-wide s4 part), else the full width
        return img(128 if p.shape[-1] >= 128 and nf <= 128
                   else p.shape[-1])

    return pl.pallas_call(
        functools.partial(_kernel, nf, gc, h, w),
        grid=(b,),
        in_specs=[img(gc), pspec(p0), pspec(p1), pspec(p2), pspec(p3),
                  img(nf),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=img(nf),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, gc), c3.dtype),
            pltpu.VMEM((h, w + 2, 3 * gc), c3.dtype),
            pltpu.VMEM((h * w, nf), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * w * gc * nf,
            bytes_accessed=(c3.size + 5 * b * h * w * nf + x.size)
            * c3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(c3, p0, p1, p2, p3, x, w4_k, b4.astype(jnp.float32))


def _pick_row_chunk(h: int, target: int = 32) -> int:
    """Largest divisor of ``h`` that is <= target (>= 8 when possible)."""
    for r in range(min(target, h), 0, -1):
        if h % r == 0:
            return r
    return h


@functools.partial(jax.jit,
                   static_argnames=('row_chunk', 'interpret'))
def stage4_pallas_chunked(c3, p0, p1, p2, p3, x, w4, b4,
                          row_chunk: int = 32, interpret: bool = False):
    """Row-chunked :func:`stage4_pallas` — same math, Mosaic-compilable at
    large spatial shapes.

    The whole-image kernel compiles on this toolchain's remote Mosaic
    helper only up to ~32 rows (compile time scales with the unrolled
    row dim; 64^2+ times out at 500 s — verify SKILL.md).  Here the image
    rows are split into ``h // row_chunk`` chunks folded into the grid:
    ``c3`` is zero-border-padded AND given 1-row inter-chunk halos by XLA
    (cheap: gc-wide buffer), so each grid step runs the proven small-row
    kernel; the pointwise partials/x/out reshape for free.  Bit-identical
    to :func:`stage4_pallas` (same tap order and fp32 accumulation).
    """
    b, h, w, gc = c3.shape
    nf = x.shape[-1]
    r = _pick_row_chunk(h, row_chunk)
    nc = h // r
    w4_k = jnp.transpose(w4, (1, 0, 2, 3)).reshape(3, 3 * gc, nf) \
        .astype(c3.dtype)

    # [b, h+2, w+2, gc] zero borders, then overlapping row windows of
    # r+2 rows -> [b*nc, r+2, w+2, gc]
    c3p = jnp.pad(c3, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wins = [jax.lax.slice_in_dim(c3p, t * r, t * r + r + 2, axis=1)
            for t in range(nc)]
    c3c = jnp.stack(wins, axis=1).reshape(b * nc, r + 2, w + 2, gc)

    def chunk(a):
        return a.reshape(b * nc, r, w, a.shape[-1])

    img = lambda ch, rows: pl.BlockSpec(
        (1, rows, w if rows == r else w + 2, ch),
        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    def pspec(p):
        return img(128 if p.shape[-1] >= 128 and nf <= 128
                   else p.shape[-1], r)

    out = pl.pallas_call(
        functools.partial(_kernel_prepad, nf, gc, r, w),
        grid=(b * nc,),
        in_specs=[img(gc, r + 2), pspec(p0), pspec(p1), pspec(p2),
                  pspec(p3), img(nf, r),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=img(nf, r),
        out_shape=jax.ShapeDtypeStruct((b * nc, r, w, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, w + 2, 3 * gc), c3.dtype),
            pltpu.VMEM((r * w, nf), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * w * gc * nf,
            bytes_accessed=(c3.size + 5 * b * h * w * nf + x.size)
            * c3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(c3c, chunk(p0), chunk(p1), chunk(p2), chunk(p3), chunk(x),
      w4_k, b4.astype(jnp.float32))
    return out.reshape(b, h, w, nf)
