"""Probe VERDICT-r3 #7: the small-batch serving cliff and batch padding.

BENCH_CURVE.json shows the flagship generator's b64 forward takes LONGER in
absolute time than b128 (864 vs 792 ms) — the conv-efficiency cliff at
batch 128 (CLAUDE.md) makes intermediate batches pathological.  If
t(128) < t(64), padding a 64-image request to 128 is a strict win; the
break-even batch decides the serving policy.

Times the exact bench.py program (grouped bf16 trunk + fp32 CEM tail,
LR 128 -> HR 512) at b in (8, 16, 32, 48, 64, 96, 128) in ONE process and
derives, for each real request size, the best execution bucket:

    eff(b) = b / min_{B >= b} t(B)

Output: per-batch JSON lines plus the best-bucket policy table that
`exsr.utils.serve.best_bucket` and the README serving note record.

Timing per the verify-skill methodology: REPS iterations chained inside
one jitted scan with a zero-scaled carry dependency on the input, fetch a
dependent scalar covering the whole output.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import (pack_grouped_params,
                                       rrdbnet_apply_fast)

    LR_SIZE, SCALE, REPS = 128, 4, 8
    cem = CEM.create(CEMConf(scale_factor=SCALE))
    filt = cem.device_filters(3)
    g = RRDBNet(nb=23, latent_channels=3)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32),
                    jnp.zeros((1, LR_SIZE * SCALE, LR_SIZE * SCALE, 3),
                              jnp.float32))
    packed = pack_grouped_params(params)

    def g_apply(pk, x, zz):
        return rrdbnet_apply_fast(None, x, zz, packed=pk,
                                  dtype=jnp.bfloat16)

    wrapped = cem_wrap(g_apply, filt, upscale=SCALE)
    compiler_opts = {'xla_tpu_scoped_vmem_limit_kib': '81920'}

    times = {}
    for b in (8, 16, 32, 48, 64, 96, 128):
        lr = jnp.zeros((b, LR_SIZE, LR_SIZE, 3), jnp.float32)
        z = jnp.zeros((b, LR_SIZE * SCALE, LR_SIZE * SCALE, 3),
                      jnp.float32)

        def run_n(pk, lr, z):
            def body(carry, _):
                out = jnp.clip(wrapped(pk, lr + 0.0 * carry, z, 0,
                                       pre_pad=False), 0.0, 1.0)
                return out.mean().astype(jnp.float32), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return r

        f = jax.jit(run_n).lower(packed, lr, z).compile(compiler_opts)
        float(f(packed, lr, z))
        t0 = time.perf_counter()
        float(f(packed, lr, z))
        dt = (time.perf_counter() - t0) / REPS
        times[b] = dt
        print(json.dumps({'batch': b, 'ms_per_fwd': round(dt * 1e3, 1),
                          'img_per_s': round(b / dt, 1)}), flush=True)

    policy = []
    batches = sorted(times)
    for b in batches:
        best = min((B for B in batches if B >= b), key=lambda B: times[B])
        policy.append({'request': b, 'run_at': best,
                       'direct_img_per_s': round(b / times[b], 1),
                       'padded_img_per_s': round(b / times[best], 1)})
    print(json.dumps({'policy': policy}), flush=True)


if __name__ == '__main__':
    main()
