"""VERDICT-r4 next #7's "at most two cheap new probes" — probe 1:
conv `dimension_numbers` / layout sweep at the trunk's hot shapes.

The b128 trunk runs at 72-87% of per-op roofline with the stage-4
epilogue at 24.5 TF/s (PROFILE_r03.json).  One untested degree of freedom
remained: the logical conv layout handed to XLA.  The trunk uses NHWC
activations + HWIO kernels (flax default); XLA:TPU re-lays-out
internally, but the chosen logical layout can still change the emitted
fusion boundaries.  This probe times one RDB's conv chain (w0..w3 +
stage-4 concat+conv+residual, the exact grouped decomposition) at b128
128x128 bf16 under (a) NHWC/HWIO, (b) NCHW/OIHW, (c) NHWC/OHWI.

Timing per the verify-skill methodology: REPS chained iterations inside
one jitted scan, carry perturbs the input, dependent scalar fetched.
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
    from jax import lax

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    B, HW, REPS = 128, 128, 12
    NF, GC, NZ = 64, 32, 3
    key = jax.random.PRNGKey(0)

    # grouped-RDB conv widths (rrdb_fast.py decomposition):
    # w0: 67 -> 192 (the 4 stage outputs packed), then per-stage 32-in
    # convs 160/128/96, then stage4: concat(4x32 partial sums read back)
    # -> 32 -> 64 + residual.  We time the *logical-layout* variants of
    # the same chain.
    shapes = [(NF + NZ, 6 * GC), (GC, 5 * GC), (GC, 4 * GC), (GC, 3 * GC),
              (4 * GC, 2 * GC), (2 * GC, NF)]

    def make_ws(layout):
        ws = []
        k = key
        for i, (ci, co) in enumerate(shapes):
            k, sub = jax.random.split(k)
            w = jax.random.normal(sub, (3, 3, ci, co), jnp.bfloat16) * 0.05
            if layout == 'OIHW':
                w = jnp.transpose(w, (3, 2, 0, 1))
            elif layout == 'OHWI':
                w = jnp.transpose(w, (3, 0, 1, 2))
            ws.append(w)
        return ws

    def chain(x, ws, dn):
        act = x
        for w in ws:
            ci = (w.shape[2] if dn[1] == 'HWIO' else
                  (w.shape[1] if dn[1] == 'OIHW' else w.shape[3]))
            if dn[0] == 'NHWC':
                a = act[..., :ci]
            else:
                a = act[:, :ci]
            y = lax.conv_general_dilated(
                a, w, (1, 1), 'SAME', dimension_numbers=dn)
            y = jnp.maximum(y, 0.2 * y)
            # keep channel count flowing: pad/trim back to NF lanes
            if dn[0] == 'NHWC':
                act = y[..., :NF] if y.shape[-1] >= NF else jnp.pad(
                    y, ((0, 0), (0, 0), (0, 0), (0, NF - y.shape[-1])))
            else:
                act = y[:, :NF] if y.shape[1] >= NF else jnp.pad(
                    y, ((0, 0), (0, NF - y.shape[1]), (0, 0), (0, 0)))
        return act

    results = {}
    for name, dn in (('NHWC/HWIO', ('NHWC', 'HWIO', 'NHWC')),
                     ('NCHW/OIHW', ('NCHW', 'OIHW', 'NCHW')),
                     ('NHWC/OHWI', ('NHWC', 'OHWI', 'NHWC'))):
        ws = make_ws(dn[1])
        if dn[0] == 'NHWC':
            x = jnp.zeros((B, HW, HW, NF + NZ), jnp.bfloat16)
        else:
            x = jnp.zeros((B, NF + NZ, HW, HW), jnp.bfloat16)

        def run_n(x, ws=ws, dn=dn):
            def body(carry, _):
                out = chain(x + carry.astype(jnp.bfloat16), ws, dn)
                return out.mean().astype(jnp.float32), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return r

        f = jax.jit(run_n).lower(x).compile(
            {'xla_tpu_scoped_vmem_limit_kib': '81920'})
        float(f(x))
        t0 = time.perf_counter()
        float(f(x))
        dt = (time.perf_counter() - t0) / REPS
        results[name] = round(dt * 1e3, 2)
        print(json.dumps({'layout': name, 'ms_per_chain': results[name]}),
              flush=True)
    base = results['NHWC/HWIO']
    print(json.dumps({'baseline': 'NHWC/HWIO', 'ms': base,
                      'deltas_pct': {k: round(100 * (v - base) / base, 1)
                                     for k, v in results.items()}}),
          flush=True)


if __name__ == '__main__':
    main()
