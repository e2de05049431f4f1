"""Pallas TPU kernel: a fused RRDB block (3 residual dense blocks).

The RRDB trunk dominates the generator's cost.  In the XLA lowering each of
the ~48 convs/concats/activations of one block is a separate device op; this
kernel computes the whole block as ONE device op with the image resident in
VMEM:

  * a single zero-bordered feature buffer in VMEM holds (z ++ x ++ dense
    features) — dense-block concatenation becomes channel-offset writes;
  * each zero-padded 3x3 conv is nine shifted slice-loads from that buffer
    feeding MXU matmuls into an fp32 accumulator scratch;
  * leaky-relu chains and both residual scales happen in-register.

Layout: NHWC, one grid program per batch element.  Zero 'SAME' padding
matches the reference's pad_type='zero' RDB convs (block.py:196-242).

VMEM budget per program (128x128, bf16): feature buffer 130x130x200 ~6.8 MB,
fp32 accumulator 128x128x64 = 4 MB, weights ~1.5 MB — inside the 16 MB core
budget.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_rdbs, nf, gc, nz, h, w):
    def kernel(x_ref, z_ref, *refs):
        return _rrdb_kernel(n_rdbs, nf, gc, nz, h, w, x_ref, z_ref, *refs)
    return kernel


def _rrdb_kernel(n_rdbs, nf, gc, nz, h, w, x_ref, z_ref, *refs):
    weights_refs = refs[:10 * n_rdbs]
    out_ref = refs[10 * n_rdbs]
    feats_ref = refs[10 * n_rdbs + 1]  # [h+2, w+2, cap] zero-bordered buf
    acc_ref = refs[10 * n_rdbs + 2]    # [h*w, nf] fp32 accumulator

    feats_ref[:] = jnp.zeros_like(feats_ref)
    feats_ref[1:h + 1, 1:w + 1, 0:nz] = z_ref[0]
    feats_ref[1:h + 1, 1:w + 1, nz:nz + nf] = x_ref[0]
    x0 = x_ref[0]

    def conv3x3(ch_in, wk_ref, bias, cout):
        """3x3 conv as 3 row-shifted loads x 3 column rolls -> MXU matmuls.

        Row (H) starts may be dynamic (untiled dim); column (W) shifts must
        be 8-aligned in Mosaic, so the three horizontal taps come from ONE
        aligned [h, w+2] load via pltpu.roll — the buffer's zero border
        makes the rolled wrap-around column land outside the kept window."""
        acc_ref[:, :cout] = jnp.broadcast_to(bias[None, :cout],
                                             (h * w, cout))
        # fully static tap unrolling: dynamic-slice loops proved pathological
        # for the Mosaic compile service; static row starts (untiled dim 0)
        # are free, horizontal taps come from rolling the fp32 result
        for ky in range(3):
            row = feats_ref[ky:ky + h, 0:w + 2, 0:ch_in]
            for dx in range(3):
                wt = wk_ref[ky, dx, 0:ch_in, 0:cout]
                y = jax.lax.dot_general(
                    row.reshape(h * (w + 2), ch_in), wt,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).reshape(h, w + 2, cout)
                if dx > 0:
                    y = pltpu.roll(y, shift=w + 2 - dx, axis=1)
                acc_ref[:, :cout] += y[:, 0:w, :].reshape(h * w, cout)
        return acc_ref[:, :cout].reshape(h, w, cout)

    cur = x0
    for r in range(n_rdbs):
        # (re)write the image channels for this RDB; borders stay zero
        feats_ref[1:h + 1, 1:w + 1, nz:nz + nf] = cur
        ch = nz + nf
        for i in range(5):
            wk_ref = weights_refs[2 * (5 * r + i)]
            bias = weights_refs[2 * (5 * r + i) + 1][:]
            cout = gc if i < 4 else nf
            acc = conv3x3(ch, wk_ref, bias, cout)
            if i < 4:
                feats_ref[1:h + 1, 1:w + 1, ch:ch + gc] = \
                    jax.nn.leaky_relu(acc, 0.2).astype(feats_ref.dtype)
                ch += gc
            else:
                cur = (acc * 0.2 + cur.astype(jnp.float32)) \
                    .astype(x0.dtype)
    if n_rdbs == 3:  # full RRDB: outer residual included
        out_ref[0] = cur * jnp.asarray(0.2, x0.dtype) + x0
    else:
        out_ref[0] = cur


@functools.partial(jax.jit,
                   static_argnames=('nf', 'gc', 'interpret'))
def rrdb_block_pallas(x: jnp.ndarray, z: jnp.ndarray, params: dict,
                      nf: int = 64, gc: int = 32,
                      interpret: bool = False) -> jnp.ndarray:
    """One fused RRDB block: x [B, H, W, nf], z [B, H, W, nz].

    ``params`` is the flax param subtree of one RRDB (rdb{1,2,3}/conv{0..4}
    /Conv_0/{kernel, bias}) WITHOUT the scan's leading block axis.
    """
    b, h, w, _ = x.shape
    nz = z.shape[-1]
    cap = nz + nf + 4 * gc  # feature-buffer channel capacity
    flat = []
    for r in (1, 2, 3):
        for c in range(5):
            leaf = params[f'rdb{r}'][f'conv{c}']['Conv_0']
            flat.append(jnp.asarray(leaf['kernel'], x.dtype))
            flat.append(jnp.asarray(leaf['bias'], jnp.float32))
    kernel = _make_kernel(3, nf, gc, nz, h, w)
    img_spec = lambda ch: pl.BlockSpec((1, h, w, ch),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
    flops = 2 * 9 * h * w * ((nf + nz) * gc + (nf + nz + gc) * gc
                             + (nf + nz + 2 * gc) * gc
                             + (nf + nz + 3 * gc) * gc
                             + (nf + nz + 4 * gc) * nf) * 3
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[img_spec(x.shape[-1]), img_spec(nz)] + w_specs,
        out_specs=img_spec(nf),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cap), x.dtype),
            pltpu.VMEM((h * w, nf), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops * b,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, z, *flat)


@functools.partial(jax.jit, static_argnames=('nf', 'gc', 'interpret'))
def rdb_pallas(x: jnp.ndarray, z: jnp.ndarray, rdb_params: dict,
               nf: int = 64, gc: int = 32,
               interpret: bool = False) -> jnp.ndarray:
    """One fused residual dense block (5 convs) as a single device op —
    a 3x smaller Mosaic program than the full RRDB kernel (compile-service
    limits); chain three + the outer residual for a full block."""
    b, h, w, _ = x.shape
    nz = z.shape[-1]
    cap = nz + nf + 4 * gc
    flat = []
    for c in range(5):
        leaf = rdb_params[f'conv{c}']['Conv_0']
        flat.append(jnp.asarray(leaf['kernel'], x.dtype))
        flat.append(jnp.asarray(leaf['bias'], jnp.float32))
    kernel = _make_kernel(1, nf, gc, nz, h, w)
    img_spec = lambda ch: pl.BlockSpec((1, h, w, ch),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[img_spec(x.shape[-1]), img_spec(nz)] + w_specs,
        out_specs=img_spec(nf),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cap), x.dtype),
            pltpu.VMEM((h * w, nf), jnp.float32),
        ],
        interpret=interpret,
    )(x, z, *flat)


def rrdb_block_chained(x, z, params, nf=64, gc=32, interpret=False):
    """Full RRDB block via three single-RDB pallas calls (3 device ops)."""
    cur = x
    for r in (1, 2, 3):
        cur = rdb_pallas(cur, z, params[f'rdb{r}'], nf=nf, gc=gc,
                         interpret=interpret)
    return cur * jnp.asarray(0.2, x.dtype) + x
