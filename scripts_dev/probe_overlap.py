"""Probe VERDICT-r3 #1a: cross-op overlap via interleaved multi-stream trunks.

The r3 trace (PROFILE_r03.json) shows the stage-4 epilogue fusion is
HBM-BW-bound (87% of its per-op roofline) while the grouped convs w0-w3 are
MXU-bound — per-op rooflines sum to 203.6 img/s so >200 needs ~98% per-op
efficiency UNLESS ops overlap.  XLA TPU executes one fusion at a time, but
its latency-hiding scheduler can in principle overlap a fusion's HBM DMA
with a *neighbouring independent* fusion's MXU work — which the single
b128 trunk never offers it (the whole chain is sequentially dependent).

This probe feeds the scheduler independent work at three granularities:
each variant processes the same 128 images' worth of trunk per step,
split into S independent streams whose ops are interleaved in program
order so every HBM-bound epilogue has an adjacent MXU-bound conv from
another stream.

  single      1 x b128   (baseline == committed BENCH trunk path)
  dual_rdb    2 x b64    streams alternate per-RDB
  dual_stage  2 x b64    streams alternate per-conv (finest interleave)
  quad_rdb    4 x b32    more overlap candidates, worse per-conv shapes

Reference dataflow being computed: block.py:196-270 (RRDB).  Math per
stream is identical to rrdb_trunk_fast (same helpers).
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
    from exsr.models.rrdb_fast import (_conv, _rdb_grouped,
                                       pack_grouped_params)
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
    lr1 = jnp.zeros((1, H, W, 3), jnp.float32)
    z1 = jnp.zeros((1, 4 * H, 4 * W, 3), jnp.float32)
    params = g.init(key, lr1, z1)
    packed_trunk, rest = pack_grouped_params(params)

    def trunk_streams(lrs, zs):
        """Interleaved trunk over S streams: zip at RDB granularity."""
        feas = []
        z_lrs = []
        for lr, z in zip(lrs, zs):
            z_lr = bilinear_resize(z.astype(dt), H, W)
            x = jnp.concatenate([z_lr, lr.astype(dt)], -1)
            feas.append(_conv(x, rest['fea_conv']['kernel'],
                              rest['fea_conv']['bias']))
            z_lrs.append(z_lr)

        def block(carry, bp):
            xs = list(carry)
            for r in ('rdb1', 'rdb2', 'rdb3'):
                xs = [_rdb_grouped(x, zl, bp[r], nf, gc)
                      for x, zl in zip(xs, z_lrs)]
            return tuple(o * 0.2 + c for o, c in zip(xs, carry)), None

        outs, _ = jax.lax.scan(block, tuple(feas), packed_trunk)
        tc = rest['trunk_conv']['Conv_0']
        return [fea + _conv(jnp.concatenate([zl, t], -1),
                            tc['kernel'], tc['bias'])
                for fea, t, zl in zip(feas, outs, z_lrs)]

    def rdb_dual_stage(xa, xb, za, zb, e):
        """One RDB on two streams with per-conv interleaving."""
        widths = [gc, gc, gc, gc, nf]

        def sl(P, g, i):
            if i == 4:
                return P[..., :nf]
            off = nf + sum(widths[j] for j in range(g, i))
            return P[..., off:off + widths[i]]

        Pa = [None] * 5
        Pb = [None] * 5
        Pa[0] = _conv(jnp.concatenate([za, xa], -1), e['w0'])
        Pb[0] = _conv(jnp.concatenate([zb, xb], -1), e['w0'])
        ca = [None] * 4
        cb = [None] * 4
        ca[0] = jax.nn.leaky_relu(sl(Pa[0], 0, 0) + e['b0'].astype(dt), 0.2)
        cb[0] = jax.nn.leaky_relu(sl(Pb[0], 0, 0) + e['b0'].astype(dt), 0.2)
        for i in range(1, 4):
            Pa[i] = _conv(ca[i - 1], e[f'w{i}'])
            Pb[i] = _conv(cb[i - 1], e[f'w{i}'])
            acc_a = sl(Pa[0], 0, i)
            acc_b = sl(Pb[0], 0, i)
            for gi in range(1, i + 1):
                acc_a = acc_a + sl(Pa[gi], gi, i)
                acc_b = acc_b + sl(Pb[gi], gi, i)
            ca[i] = jax.nn.leaky_relu(acc_a + e[f'b{i}'].astype(dt), 0.2)
            cb[i] = jax.nn.leaky_relu(acc_b + e[f'b{i}'].astype(dt), 0.2)
        Pa[4] = _conv(ca[3], e['w4'])
        Pb[4] = _conv(cb[3], e['w4'])
        oa = sum(sl(Pa[g], g, 4) for g in range(5)) + e['b4'].astype(dt)
        ob = sum(sl(Pb[g], g, 4) for g in range(5)) + e['b4'].astype(dt)
        return oa * 0.2 + xa, ob * 0.2 + xb

    def trunk_dual_stage(lrs, zs):
        za = bilinear_resize(zs[0].astype(dt), H, W)
        zb = bilinear_resize(zs[1].astype(dt), H, W)
        fa = _conv(jnp.concatenate([za, lrs[0].astype(dt)], -1),
                   rest['fea_conv']['kernel'], rest['fea_conv']['bias'])
        fb = _conv(jnp.concatenate([zb, lrs[1].astype(dt)], -1),
                   rest['fea_conv']['kernel'], rest['fea_conv']['bias'])

        def block(carry, bp):
            a, b = carry
            for r in ('rdb1', 'rdb2', 'rdb3'):
                a, b = rdb_dual_stage(a, b, za, zb, bp[r])
            return (a * 0.2 + carry[0], b * 0.2 + carry[1]), None

        (oa, ob), _ = jax.lax.scan(block, (fa, fb), packed_trunk)
        tc = rest['trunk_conv']['Conv_0']
        return [fa + _conv(jnp.concatenate([za, oa], -1),
                           tc['kernel'], tc['bias']),
                fb + _conv(jnp.concatenate([zb, ob], -1),
                           tc['kernel'], tc['bias'])]

    def timed(name, n_streams, fn):
        bs = B // n_streams
        lrs = [jax.random.normal(jax.random.PRNGKey(i), (bs, H, W, 3),
                                 jnp.float32) for i in range(n_streams)]
        zs = [jnp.zeros((bs, 4 * H, 4 * W, 3), jnp.float32)
              for _ in range(n_streams)]

        def run(lrs, zs):
            def body(carry, _):
                outs = fn([l + 1e-6 * carry for l in lrs], zs)
                return sum(o.mean() for o in outs).astype(jnp.float32), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_IT)
            return r

        try:
            f = jax.jit(run).lower(lrs, zs).compile(
                compiler_options={'xla_tpu_scoped_vmem_limit_kib': '81920'})
            float(f(lrs, zs))
            t0 = time.perf_counter()
            float(f(lrs, zs))
            ms = (time.perf_counter() - t0) / N_IT * 1e3
        except Exception as e:
            print(json.dumps({'name': name, 'error': str(e)[:200]}),
                  flush=True)
            return
        print(json.dumps({'name': name, 'streams': n_streams,
                          'ms_per_b128_trunk': round(ms, 1)}), flush=True)

    timed('single', 1, trunk_streams)
    timed('dual_rdb', 2, trunk_streams)
    timed('dual_stage', 2, trunk_dual_stage)
    timed('quad_rdb', 4, trunk_streams)


if __name__ == '__main__':
    main()
