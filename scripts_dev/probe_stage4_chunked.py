"""Probe: compile + time the row-chunked stage-4 Pallas kernel at the
b128 trunk shape on the real TPU, vs the XLA epilogue.

The whole-image stage4 kernel Mosaic-compiles only up to ~32 rows; the
chunked variant folds 32-row chunks into the grid so the b128 case
(128x128 spatial) compiles like the proven small case.  Target: the
in-program stage-4 fusion runs 3.15 ms/RDB (PROFILE_r03.json); bytes
floor ~2.0 ms, matmul ~1.0 — an overlapped kernel should land ~2.1 ms.
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

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from exsr.ops.pallas.stage4 import stage4_pallas_chunked

    B, H, W = 128, 128, 128
    nf, gc = 64, 32
    N_IT = 20
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    c3 = jax.random.normal(key, (B, H, W, gc), dt)
    P0 = jax.random.normal(key, (B, H, W, 192), dt)
    P1 = jax.random.normal(key, (B, H, W, 160), dt)
    P2 = jax.random.normal(key, (B, H, W, 128), dt)
    P3 = jax.random.normal(key, (B, H, W, 96), dt)
    x = jax.random.normal(key, (B, H, W, nf), dt)
    w4 = jax.random.normal(key, (3, 3, gc, nf), dt) * 0.05
    b4 = jax.random.normal(key, (nf,), jnp.float32)

    def conv(a, k):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def xla_epilogue(c3, p0, p1, p2, p3, x, w4, b4):
        y = conv(c3, w4) + b4.astype(c3.dtype)
        s = (p0[..., :nf] + p1[..., :nf] + p2[..., :nf] + p3[..., :nf])
        return (y + s) * 0.2 + x

    results = {}
    for name, fn in [('pallas_chunked',
                      lambda *a: stage4_pallas_chunked(*a)),
                     ('xla', xla_epilogue)]:
        def run_fn(c3, p0, p1, p2, p3, x, w4, b4, fn=fn):
            def body(carry, _):
                out = fn(c3 + carry.astype(dt), p0, p1, p2, p3, x, w4, b4)
                return out.mean().astype(jnp.float32), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_IT)
            return r

        # match bench.py's scoped-VMEM budget: the r=32 kernel's stack
        # allocation is 17.4 MiB (> the 16 MiB default limit)
        lowered = jax.jit(run_fn).lower(c3, P0, P1, P2, P3, x, w4, b4)
        try:
            run = lowered.compile(compiler_options={
                'xla_tpu_scoped_vmem_limit_kib': '81920'})
        except Exception:
            run = lowered.compile()

        t0 = time.time()
        v = float(run(c3, P0, P1, P2, P3, x, w4, b4))
        compile_s = time.time() - t0
        t0 = time.time()
        v = float(run(c3, P0, P1, P2, P3, x, w4, b4))
        ms = (time.time() - t0) / N_IT * 1000
        results[name] = {'compile_s': round(compile_s, 1),
                         'ms_per_call': round(ms, 3), 'check': v}
        print(name, results[name], flush=True)

    # exactness vs XLA at this shape (compare inside one compiled-with-
    # options program — the standalone kernel jit would hit the 16 MiB
    # scoped-VMEM default)
    def err_fn(c3, p0, p1, p2, p3, x, w4, b4):
        a = stage4_pallas_chunked(c3, p0, p1, p2, p3, x, w4, b4)
        b = xla_epilogue(c3, p0, p1, p2, p3, x, w4, b4)
        return jnp.max(jnp.abs(a.astype(jnp.float32)
                               - b.astype(jnp.float32)))
    err_c = jax.jit(err_fn).lower(
        c3, P0, P1, P2, P3, x, w4, b4).compile(compiler_options={
            'xla_tpu_scoped_vmem_limit_kib': '81920'})
    results['max_abs_err_vs_xla'] = float(
        err_c(c3, P0, P1, P2, P3, x, w4, b4))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
