"""TPU probe: fused stage-4 Pallas kernel vs the XLA fusion at b128,
plus exactness on-device and the full-trunk effect.

Usage: python scripts_dev/probe_stage4_pallas.py [micro|trunk]
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
    import numpy as np
    from exsr.ops.pallas.stage4 import stage4_pallas

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    which = sys.argv[1] if len(sys.argv) > 1 else 'micro'
    B, H, W, nf, gc = 128, 128, 128, 64, 32
    N_IT = 20
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    if which == 'micro':
        c3 = jax.random.normal(key, (B, H, W, gc), dt)
        ps = [jax.random.normal(key, (B, H, W, nf + k * gc), dt)
              for k in (4, 3, 2, 1)]
        x = jax.random.normal(key, (B, H, W, nf), dt)
        w4 = jax.random.normal(key, (3, 3, gc, nf), dt) * 0.05
        b4 = jnp.zeros((nf,), jnp.float32)

        # exactness on-device vs the XLA formulation (small slice check)
        def xla_ref(c3, p0, p1, p2, p3, x):
            conv = jax.lax.conv_general_dilated(
                c3, w4.astype(dt), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return (conv + b4.astype(dt)
                    + p0[..., :nf] + p1[..., :nf] + p2[..., :nf]
                    + p3[..., :nf]) * jnp.asarray(0.2, dt) + x

        try:
            t0 = time.perf_counter()
            out_k = stage4_pallas(c3[:2], *[p[:2] for p in ps], x[:2],
                                  w4, b4)
            got = np.asarray(out_k.astype(jnp.float32))
            tc = time.perf_counter() - t0
        except Exception as e:
            print(json.dumps({'pallas_compile_error': str(e)[:300]}),
                  flush=True)
            return
        ref = np.asarray(jax.jit(xla_ref)(
            c3[:2], *[p[:2] for p in ps], x[:2]).astype(jnp.float32))
        err = float(np.abs(got - ref).max())
        print(json.dumps({'exactness_max_abs_err': err,
                          'small_compile_s': round(tc, 1)}), flush=True)

        def timed(name, fn, *args):
            def run(*a):
                def body(carry, _):
                    out = fn(a[0] + 0.0 * carry.astype(dt), *a[1:])
                    return out.mean().astype(jnp.float32), None
                r, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=N_IT)
                return r
            try:
                t0 = time.perf_counter()
                f = jax.jit(run).lower(*args).compile(
                    compiler_options={
                        'xla_tpu_scoped_vmem_limit_kib': '81920'})
                tc = time.perf_counter() - t0
                float(f(*args))
                t0 = time.perf_counter()
                float(f(*args))
                ms = (time.perf_counter() - t0) / N_IT * 1e3
                print(json.dumps({'name': name, 'ms': round(ms, 3),
                                  'compile_s': round(tc, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({'name': name, 'error': str(e)[:200]}),
                      flush=True)

        timed('xla_stage4', xla_ref, c3, *ps, x)
        timed('pallas_stage4',
              lambda c3, p0, p1, p2, p3, x: stage4_pallas(
                  c3, p0, p1, p2, p3, x, w4, b4), c3, *ps, x)
        return

    # full-trunk comparison
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import pack_grouped_params, rrdb_trunk_fast
    g = RRDBNet(nb=23, latent_channels=3)
    lr1 = jnp.zeros((1, H, W, 3), jnp.float32)
    z1 = jnp.zeros((1, 4 * H, 4 * W, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), lr1, z1)
    packed = pack_grouped_params(params)
    lr = jnp.zeros((B, H, W, 3), jnp.float32)
    z = jnp.zeros((B, 4 * H, 4 * W, 3), jnp.float32)

    for use_pallas in (False, True):
        def run(pk, lr, z):
            def body(carry, _):
                f = rrdb_trunk_fast(pk, lr + 0.0 * carry, z,
                                    dtype=jnp.bfloat16,
                                    stage4_pallas=use_pallas)
                return f.mean().astype(jnp.float32), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=8)
            return r
        try:
            t0 = time.perf_counter()
            f = jax.jit(run).lower(packed, lr, z).compile(
                compiler_options={'xla_tpu_scoped_vmem_limit_kib': '81920'})
            tc = time.perf_counter() - t0
            float(f(packed, lr, z))
            t0 = time.perf_counter()
            float(f(packed, lr, z))
            ms = (time.perf_counter() - t0) / 8 * 1e3
            print(json.dumps({'trunk_pallas': use_pallas,
                              'ms_per_fwd': round(ms, 1),
                              'compile_s': round(tc, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({'trunk_pallas': use_pallas,
                              'error': str(e)[:200]}), flush=True)


if __name__ == '__main__':
    main()
