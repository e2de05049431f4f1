"""Probe VERDICT-r3 #2: measure the per-op execution floor directly.

The r3 claim "~6.5 ms of the 9.74 ms edit step is shape-independent per-op
dispatch (~2000 sequential ops at 3-6 us)" was inferred from one crop-size
change.  This probe measures the floor itself, independent of the model: a
chain of N sequentially-dependent 3x3 convs at the 16-LR edit-crop shape
(b1 40x40, the BENCH_EDIT bucket), N swept, both

  rolled    one conv inside lax.scan(length=N) — 1 compiled op, N executions
  unrolled  N distinct conv ops in program order (the edit step's actual
            structure: the fwd+bwd of the 23-block trunk unrolls to ~2000
            fusions)

and at two channel widths (64 and 16: 16x the FLOPs at identical op count),
so the time/op slope separates per-op overhead from tiny-shape compute:

  slope_c = overhead + compute_c      =>   overhead ~ (16*slope_16 -
                                           slope_64) / 15

Edit-step budget being tested: GUI.py:51-62 (interactive latency), PARITY.md
<5 ms target row.
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

    H = W = 40   # the 16-LR window's crop bucket (BENCH_EDIT_r03)
    REPS = 30
    key = jax.random.PRNGKey(0)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    results = []
    for c in (64, 16):
        x = jax.random.normal(key, (1, H, W, c), jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
             * (0.5 / (3 * c) ** 0.5))
        flop = 2 * 9 * H * W * c * c

        for mode in ('rolled', 'unrolled'):
            pts = []
            for n in ((64, 128, 256, 512) if mode == 'rolled'
                      else (64, 128, 256)):
                if mode == 'rolled':
                    def prog(x, w, n=n):
                        def body(cr, _):
                            return conv(cr, w), None
                        out, _ = jax.lax.scan(body, x, None, length=n)
                        return out.mean().astype(jnp.float32)
                else:
                    def prog(x, w, n=n):
                        cr = x
                        for _ in range(n):
                            cr = conv(cr, w)
                        return cr.mean().astype(jnp.float32)

                # REPS outer repeats, input perturbed by the carry so the
                # chain cannot be hoisted (verify-skill timing trap)
                def run(x, w):
                    def body(cr, _):
                        pert = (1e-6 * cr).astype(x.dtype)
                        return prog(x + pert, w), None
                    r, _ = jax.lax.scan(body, jnp.float32(0), None,
                                        length=REPS)
                    return r

                try:
                    f = jax.jit(run).lower(x, w).compile()
                    float(f(x, w))
                    t0 = time.perf_counter()
                    float(f(x, w))
                    dt = (time.perf_counter() - t0) / REPS
                except Exception as e:
                    print(json.dumps({'c': c, 'mode': mode, 'n': n,
                                      'error': str(e)[:160]}), flush=True)
                    continue
                us_per_op = dt / n * 1e6
                pts.append((n, dt))
                print(json.dumps({
                    'c': c, 'mode': mode, 'n': n,
                    'ms_total': round(dt * 1e3, 3),
                    'us_per_op': round(us_per_op, 2),
                    'tflops_per_op': round(flop / (dt / n) / 1e12, 2),
                }), flush=True)
            if len(pts) >= 2:
                (n0, t0_), (n1, t1_) = pts[0], pts[-1]
                slope = (t1_ - t0_) / (n1 - n0) * 1e6
                results.append({'c': c, 'mode': mode,
                                'slope_us_per_op': round(slope, 2)})
                print(json.dumps(results[-1]), flush=True)

    by = {(r['c'], r['mode']): r['slope_us_per_op'] for r in results}
    for mode in ('rolled', 'unrolled'):
        if (64, mode) in by and (16, mode) in by:
            ovh = (16 * by[(16, mode)] - by[(64, mode)]) / 15
            print(json.dumps({'mode': mode,
                              'overhead_us_per_op': round(ovh, 2),
                              'slope64': by[(64, mode)],
                              'slope16': by[(16, mode)]}), flush=True)


if __name__ == '__main__':
    main()
