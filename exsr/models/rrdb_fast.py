"""Grouped-conv fast inference path for the explorable RRDB generator.

Mathematically identical to :class:`exsr.models.rrdb.RRDBNet` (same params
pytree, same outputs up to fp summation order) but restructured for the
TPU MXU: a residual-dense block's conv over the growing concat
``[z, x, c0, .., c_{i-1}]`` is linear in its input channels, so instead of
five narrow convs (Cout=gc=32, ~10-25 TFLOP/s measured on v5e — the 32-wide
output uses a quarter of the MXU's 128 lanes) we run one conv per *input
group* whose output stacks that group's contribution to every later stage:

    w_zx : (nz+nf) -> gc+gc+gc+gc+nf   (e.g. 67 -> 192, ~89 TFLOP/s)
    w_c0 :       gc -> gc+gc+gc+nf     (32 -> 160)
    w_c1 :       gc -> gc+gc+nf        (32 -> 128)
    w_c2 :       gc -> gc+nf           (32 -> 96)
    w_c3 :       gc -> nf              (32 -> 64)

Stage i's pre-activation is then the sum of the matching slices plus the
stage bias.  Same FLOPs, same math (conv is linear; measured equivalence
<=1e-5 in fp32), ~1.5x faster end to end on the v5e.

The group weights are packed ONCE from the canonical RRDBNet params
(:func:`pack_grouped_params`) so checkpoints/training keep the reference
layout (architecture.py:228-302); this module is pure functions, no flax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from exsr.ops.filters import bilinear_resize, nearest_upsample


def _conv(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y if b is None else y + b.astype(x.dtype)


def pack_grouped_params(params, nf: int = 64, gc: int = 32,
                        latent_channels: int = 3):
    """RRDBNet params pytree -> packed grouped trunk weights.

    Returns ``(packed_trunk, rest)`` where ``packed_trunk`` holds, per RDB
    r in (1, 2, 3), stacked-[nb] group kernels ``w0..w4`` and stage biases
    ``b0..b4``; ``rest`` aliases the non-trunk conv entries.
    """
    p = params['params'] if 'params' in params else params
    trunk = p['trunk']['RRDB_0']
    nz = latent_channels
    bounds = [0, nz + nf] + [nz + nf + (g + 1) * gc for g in range(4)]

    packed = {}
    for r in (1, 2, 3):
        rdb = trunk[f'rdb{r}']
        kernels = [rdb[f'conv{i}']['Conv_0']['kernel'] for i in range(5)]
        biases = [rdb[f'conv{i}']['Conv_0']['bias'] for i in range(5)]
        entry = {}
        for g in range(5):
            lo, hi = bounds[g], bounds[g + 1]
            # group g feeds every stage i >= g (kernels are [nb,3,3,cin,co]).
            # The final stage's part leads (s4-first): its slice then sits
            # 64-aligned at channel 0 of every P buffer, so the stage-4
            # epilogue (XLA fusion or the Pallas kernel) selects it with a
            # plain aligned channel block.
            order = [4] + list(range(g, 4))
            entry[f'w{g}'] = jnp.concatenate(
                [kernels[i][..., lo:hi, :] for i in order], axis=-1)
        for i in range(5):
            entry[f'b{i}'] = biases[i]
        packed[f'rdb{r}'] = entry
    rest = {k: p[k] for k in ('fea_conv', 'trunk_conv', 'upconv0',
                              'upconv1', 'hr_conv0', 'hr_conv1')
            if k in p}
    return packed, rest


# phase-mixing matrix: row j of the 4-tap transposed-conv kernel takes
# these 3x3-kernel rows (see fold_upconv_kernel)
_M4 = np.array([[1., 0., 0.],
                [1., 1., 0.],
                [0., 1., 1.],
                [0., 0., 1.]])


def fold_upconv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Fold ``conv3x3(nearest_upsample(x, 2))`` into one stride-2
    TRANSPOSED conv kernel (exact, incl. zero borders).

    With nearest upsampling ``x_up[m] = x[m // 2]``, the 3x3 window of
    output row ``2i+a`` covers only low-res rows ``{i-1, i}`` (a=0) or
    ``{i, i+1}`` (a=1) with per-row-summed tap weights — per output phase
    a 2-tap kernel, which is exactly a 4-tap ``lhs_dilation=2`` conv:
    ``K4 = M @ W @ M^T`` with M = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]].
    Applied by :func:`subpixel_upconv` as a single conv producing the
    2x-upsampled output directly — no HRxHR nearest-upsample temp (the
    large-batch OOM driver) and fewer effective FLOPs (block.py:293-309).
    """
    m = jnp.asarray(_M4, k.dtype)
    return jnp.einsum('ud,ve,deco->uvco', m, m, k)


def subpixel_upconv(x: jnp.ndarray, k4: jnp.ndarray,
                    b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply a :func:`fold_upconv_kernel` result: one transposed conv
    (lhs_dilation 2, 4x4 kernel, pad 2) == conv3x3(nearest_upsample(x,2))."""
    out = jax.lax.conv_general_dilated(
        x, k4.astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out if b is None else out + b.astype(out.dtype)


def _rdb_grouped(x, z, e, nf: int, gc: int, stage4=None):
    """One residual-dense block in grouped form (block.py:196-242 math).

    P-buffer channel layout is s4-first: ``P[g] = [stage4(nf) | stage g
    (gc) | ... | stage 3 (gc)]``.  ``stage4``: optional fused epilogue
    ``stage4(c3, p0, p1, p2, p3, x, w4, b4) -> out`` (the Pallas kernel)
    replacing the final conv + 4-slice gather + residual.
    """
    widths = [gc, gc, gc, gc, nf]
    P = [None] * 5
    P[0] = _conv(jnp.concatenate([z, x], -1) if z is not None else x,
                 e['w0'])

    def sl(g, i):
        if i == 4:
            return P[g][..., :nf]
        off = nf + sum(widths[j] for j in range(g, i))
        return P[g][..., off:off + widths[i]]

    c = [None] * 4
    acc = sl(0, 0)
    c[0] = jax.nn.leaky_relu(acc + e['b0'].astype(x.dtype), 0.2)
    for i in range(1, 4):
        P[i] = _conv(c[i - 1], e[f'w{i}'])
        acc = sl(0, i)
        for g in range(1, i + 1):
            acc = acc + sl(g, i)
        c[i] = jax.nn.leaky_relu(acc + e[f'b{i}'].astype(x.dtype), 0.2)
    if stage4 is not None:
        return stage4(c[3], P[0], P[1], P[2], P[3], x,
                      e['w4'], e['b4'])
    P[4] = _conv(c[3], e['w4'])
    out = sl(0, 4) + sl(1, 4) + sl(2, 4) + sl(3, 4) + sl(4, 4) \
        + e['b4'].astype(x.dtype)
    return out * 0.2 + x


def rrdb_trunk_fast(packed, lr, z_hr=None, *, nf: int = 64, gc: int = 32,
                    dtype=jnp.bfloat16, stage4_pallas: bool = False):
    """LR-domain part of the fast forward: fea conv + scanned grouped
    trunk + trunk conv + global residual.  Returns the pre-upsample
    feature map [N, h, w, nf] (in ``dtype``).

    ``stage4_pallas``: run each RDB's stage-4 epilogue as the fused
    Pallas kernel (exsr/ops/pallas/stage4.py) — overlaps the narrow
    final conv with the HBM-bound partial gather that XLA serializes
    (PROFILE_r03.json).  Inference only (no VJP)."""
    trunk_params, rest = packed
    n, h, w, _ = lr.shape
    if dtype is not None:
        lr = lr.astype(dtype)
        z_hr = z_hr.astype(dtype) if z_hr is not None else None
    if z_hr is not None:
        z_lr = bilinear_resize(z_hr, h, w)
        x = jnp.concatenate([z_lr, lr], axis=-1)
    else:
        z_lr = None
        x = lr
    fea = _conv(x, rest['fea_conv']['kernel'], rest['fea_conv']['bias'])

    s4 = None
    if stage4_pallas:
        # the whole-image kernel only Mosaic-compiles up to ~32 rows on
        # this toolchain; the row-chunked variant covers larger shapes.
        # Degenerate chunking (no divisor of h >= 8 --> 1-2-row chunks,
        # far slower than XLA) falls back to the XLA epilogue.
        from exsr.ops.pallas import stage4 as s4mod
        if h <= 32:
            s4 = lambda *a: s4mod.stage4_pallas(*a)
        elif s4mod._pick_row_chunk(h) >= 8:
            s4 = lambda *a: s4mod.stage4_pallas_chunked(*a)

    def block(cary, bp):
        o = _rdb_grouped(cary, z_lr, bp['rdb1'], nf, gc, stage4=s4)
        o = _rdb_grouped(o, z_lr, bp['rdb2'], nf, gc, stage4=s4)
        o = _rdb_grouped(o, z_lr, bp['rdb3'], nf, gc, stage4=s4)
        return o * 0.2 + cary, None

    trunk, _ = jax.lax.scan(block, fea, trunk_params)
    tc = rest['trunk_conv']['Conv_0']
    t_in = (jnp.concatenate([z_lr, trunk], -1) if z_lr is not None
            else trunk)
    return fea + _conv(t_in, tc['kernel'], tc['bias'])


def rrdb_tail_fast(packed, feats, z_hr=None, *, upscale: int = 4,
                   out_dtype=jnp.float32):
    """HR-domain tail: subpixel upconvs + HR convs (the memory-heavy part
    — two live [N, 4h, 4w, nf] buffers; callers may batch-chunk it)."""
    _, rest = packed
    x = feats
    if z_hr is not None:
        z_hr = z_hr.astype(x.dtype)
    n_up = 1 if upscale == 3 else int(np.log2(upscale))
    for i in range(n_up):
        uc = rest[f'upconv{i}']
        if upscale == 3:
            x = nearest_upsample(x, 3)
            x = _conv(x, uc['kernel'], uc['bias'])
        else:
            x = subpixel_upconv(x, fold_upconv_kernel(uc['kernel']),
                                uc['bias'])
        x = jax.nn.leaky_relu(x, 0.2)

    h0 = rest['hr_conv0']['Conv_0']
    h_in = (jnp.concatenate([z_hr, x], -1) if z_hr is not None else x)
    x = jax.nn.leaky_relu(_conv(h_in, h0['kernel'], h0['bias']), 0.2)
    h1 = rest['hr_conv1']['Conv_0']
    h_in = (jnp.concatenate([z_hr, x], -1) if z_hr is not None else x)
    x = _conv(h_in, h1['kernel'], h1['bias'])
    return x.astype(out_dtype)


def rrdbnet_apply_fast(params, lr, z_hr=None, *, nf: int = 64,
                       gc: int = 32, nb: int = 23, upscale: int = 4,
                       latent_channels: int = 3, out_nc: int = 3,
                       dtype=jnp.bfloat16, packed=None,
                       tail_chunk: int | None = None,
                       stage4_pallas: bool = False):
    """Drop-in replacement for ``RRDBNet(...).apply(params, lr, z_hr)``
    (architecture.py:228-302 semantics; grouped trunk).

    ``packed``: optional pre-packed ``pack_grouped_params`` result —
    pass it when calling repeatedly under one jit to let the packing
    slices constant-fold once.

    ``tail_chunk``: process the HR tail in batch chunks of this size
    (``lax.map`` over chunks).  The tail's live HR buffers are the HBM
    limiter at large batch (two [N, 4h, 4w, nf] bf16 tensors, ~1.6x
    layout padding); chunking them caps tail memory at
    O(tail_chunk x HR^2) so the FLOP-heavy trunk can run at batch sizes
    where the v5e MXU is markedly more efficient.  Bit-identical to the
    unchunked path (per-image computation is independent across batch).
    """
    if packed is None:
        packed = pack_grouped_params(params, nf=nf, gc=gc,
                                     latent_channels=latent_channels)
    in_dtype = lr.dtype
    feats = rrdb_trunk_fast(packed, lr, z_hr, nf=nf, gc=gc, dtype=dtype,
                            stage4_pallas=stage4_pallas)
    n = feats.shape[0]
    if tail_chunk is None or tail_chunk >= n:
        return rrdb_tail_fast(packed, feats, z_hr, upscale=upscale,
                              out_dtype=in_dtype)
    assert n % tail_chunk == 0, (n, tail_chunk)
    k = n // tail_chunk
    feats_c = feats.reshape((k, tail_chunk) + feats.shape[1:])
    if z_hr is not None:
        z_c = z_hr.reshape((k, tail_chunk) + z_hr.shape[1:])
        args = (feats_c, z_c)
        fn = lambda a: rrdb_tail_fast(packed, a[0], a[1], upscale=upscale,
                                      out_dtype=in_dtype)
    else:
        args = feats_c
        fn = lambda a: rrdb_tail_fast(packed, a, None, upscale=upscale,
                                      out_dtype=in_dtype)
    out = jax.lax.map(fn, args)
    return out.reshape((n,) + out.shape[2:])
