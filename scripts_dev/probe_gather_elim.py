"""Probe VERDICT-r3 #1b: eliminating the stage-4 gather algebraically.

The r3 trace shows each RDB's epilogue — conv(c3, w4[32->64]) + gather of
the four 64-wide stage-4 partials from the P buffers + residual — is the
HBM-bound 30% of the trunk.  The verdict proposes consuming the partials
in the NEXT conv as split-input partial sums "so the concat is never
materialized".  Two facts about the grouped layout bound what is possible:

1. The stage-4 partials are *summed*, not concatenated: the RDB output is
   out = 0.2*(sum_g P_g[..,:64] + conv(c3,w4) + b4) + x.  Splitting the
   next RDB's w0 conv over the un-summed partials means applying the SAME
   64-input kernel to each of the 5 partials + x separately —
   conv(sum_i t_i, W) = sum_i conv(t_i, W) — which multiplies that conv's
   FLOPs ~6x.  `splitnext` measures exactly that blowup at trunk shape.

2. What CAN be restructured without extra FLOPs is *when* the partials are
   summed: `accum` folds a running s4 accumulator into each group conv's
   epilogue (multi-output fusion candidate) so the final gather reads one
   buffer instead of four.  Bytes are conserved (each partial is still
   written once and read once) so this tests XLA's fusion behaviour, not
   the roofline.

Variants (trunk-only, b128, the committed BENCH decomposition as baseline):

  baseline    rrdb_trunk_fast epilogue (4-slice gather at the end)
  accum       running s4 accumulator after each group conv
  splitnext   microbench: conv64->192 once vs 6 partial convs (the
              verdict's lever, measured honestly)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import _conv, pack_grouped_params
    from exsr.ops.filters import bilinear_resize

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    B, H, W = 128, 128, 128
    nf, gc, nz, nb = 64, 32, 3, 23
    N_IT = 8
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    g = RRDBNet(nb=nb, latent_channels=nz)
    params = g.init(key, jnp.zeros((1, H, W, 3), jnp.float32),
                    jnp.zeros((1, 4 * H, 4 * W, 3), jnp.float32))
    packed_trunk, rest = pack_grouped_params(params)
    widths = [gc, gc, gc, gc, nf]

    def rdb_accum(x, z, e):
        def sl(P, g, i):
            off = nf + sum(widths[j] for j in range(g, i))
            return P[..., off:off + widths[i]]

        P = [None] * 5
        P[0] = _conv(jnp.concatenate([z, x], -1), e['w0'])
        acc4 = P[0][..., :nf]
        c = [None] * 4
        c[0] = jax.nn.leaky_relu(sl(P[0], 0, 0) + e['b0'].astype(x.dtype),
                                 0.2)
        for i in range(1, 4):
            P[i] = _conv(c[i - 1], e[f'w{i}'])
            acc4 = acc4 + P[i][..., :nf]   # running s4 partial sum
            a = sl(P[0], 0, i)
            for gi in range(1, i + 1):
                a = a + sl(P[gi], gi, i)
            c[i] = jax.nn.leaky_relu(a + e[f'b{i}'].astype(x.dtype), 0.2)
        out = _conv(c[3], e['w4']) + acc4 + e['b4'].astype(x.dtype)
        return out * 0.2 + x

    def trunk(lr, z, rdb_fn):
        z_lr = bilinear_resize(z.astype(dt), H, W)
        fea = _conv(jnp.concatenate([z_lr, lr.astype(dt)], -1),
                    rest['fea_conv']['kernel'], rest['fea_conv']['bias'])

        def block(carry, bp):
            o = rdb_fn(carry, z_lr, bp['rdb1'])
            o = rdb_fn(o, z_lr, bp['rdb2'])
            o = rdb_fn(o, z_lr, bp['rdb3'])
            return o * 0.2 + carry, None

        out, _ = jax.lax.scan(block, fea, packed_trunk)
        tc = rest['trunk_conv']['Conv_0']
        return fea + _conv(jnp.concatenate([z_lr, out], -1),
                           tc['kernel'], tc['bias'])

    def rdb_baseline(x, z, e):
        from exsr.models.rrdb_fast import _rdb_grouped
        return _rdb_grouped(x, z, e, nf, gc)

    def timed(name, fn, *args):
        def run(*a):
            def body(carry, _):
                out = fn(a[0] + 1e-6 * carry, *a[1:])
                return out.mean().astype(jnp.float32), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_IT)
            return r
        try:
            f = jax.jit(run).lower(*args).compile(
                compiler_options={'xla_tpu_scoped_vmem_limit_kib': '81920'})
            float(f(*args))
            t0 = time.perf_counter()
            float(f(*args))
            ms = (time.perf_counter() - t0) / N_IT * 1e3
        except Exception as e:
            print(json.dumps({'name': name, 'error': str(e)[:200]}),
                  flush=True)
            return None
        print(json.dumps({'name': name, 'ms': round(ms, 2)}), flush=True)
        return ms

    lr = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    z = jnp.zeros((B, 4 * H, 4 * W, 3), jnp.float32)
    timed('baseline_trunk', lambda l, zz: trunk(l, zz, rdb_baseline), lr, z)
    timed('accum_trunk', lambda l, zz: trunk(l, zz, rdb_accum), lr, z)

    # splitnext microbench: one w0-shaped conv vs the 6-way partial-sum
    # split the verdict proposes (partials are summed, so the same kernel
    # runs once per partial)
    x64 = jax.random.normal(key, (B, H, W, nf), dt)
    parts = [jax.random.normal(jax.random.PRNGKey(i), (B, H, W, nf), dt)
             for i in range(6)]
    w = jax.random.normal(key, (3, 3, nf, 192), dt)
    timed('w0_once', lambda a, ww: _conv(a, ww), x64, w)
    timed('w0_split6',
          lambda a, ww: sum(_conv(p + 1e-6 * a[..., :1], ww)
                            for p in parts),
          x64, w)


if __name__ == '__main__':
    main()
