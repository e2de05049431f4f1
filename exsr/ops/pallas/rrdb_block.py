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


def _rrdb_kernel(nf, gc, nz, h, w, x_ref, z_ref, *refs):
    weights_refs = refs[:30]
    out_ref = refs[30]
    feats_ref = refs[31]   # [h+2, w+2, cap] zero-bordered feature buffer
    acc_ref = refs[32]     # [h*w, nf] fp32 accumulator

    feats_ref[:] = jnp.zeros_like(feats_ref)
    feats_ref[1:h + 1, 1:w + 1, 0:nz] = z_ref[0]
    feats_ref[1:h + 1, 1:w + 1, nz:nz + nf] = x_ref[0]
    x0 = x_ref[0]

    def conv3x3(ch_in, wk, bias, cout):
        """9 shifted slice-loads -> MXU matmuls accumulated in fp32.

        The taps run as a fori_loop with dynamic slice starts — 9x smaller
        Mosaic program than full unrolling (compile time matters: the block
        has 15 convs)."""
        acc_ref[:, :cout] = jnp.broadcast_to(bias[None, :cout],
                                             (h * w, cout))
        wk9 = wk[:, :, 0:ch_in, :cout].reshape(9, ch_in, cout)

        def tap(t, _):
            ky = t // 3
            kx = t % 3
            tile = feats_ref[pl.ds(ky, h), pl.ds(kx, w), 0:ch_in]
            wt = jax.lax.dynamic_index_in_dim(wk9, t, 0, keepdims=False)
            acc_ref[:, :cout] += jax.lax.dot_general(
                tile.reshape(h * w, ch_in), wt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, 9, tap, 0)
        return acc_ref[:, :cout].reshape(h, w, cout)

    cur = x0
    for r in range(3):
        # (re)write the image channels for this RDB; borders stay zero
        feats_ref[1:h + 1, 1:w + 1, nz:nz + nf] = cur
        ch = nz + nf
        for i in range(5):
            wk = weights_refs[2 * (5 * r + i)][:]
            bias = weights_refs[2 * (5 * r + i) + 1][:]
            cout = gc if i < 4 else nf
            acc = conv3x3(ch, wk, bias, cout)
            if i < 4:
                feats_ref[1:h + 1, 1:w + 1, ch:ch + gc] = \
                    jax.nn.leaky_relu(acc, 0.2).astype(feats_ref.dtype)
                ch += gc
            else:
                cur = (acc * 0.2 + cur.astype(jnp.float32)) \
                    .astype(x0.dtype)
    out_ref[0] = cur * jnp.asarray(0.2, x0.dtype) + x0


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
    kernel = functools.partial(_rrdb_kernel, nf, gc, nz, h, w)
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
