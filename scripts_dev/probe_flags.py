"""Sweep latency-hiding / scheduling compiler flags on the b128 forward
(VERDICT r2 weak #1(c)).  One JSON line per flag set."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FLAG_SETS = [
    ('baseline_vmem80', {'xla_tpu_scoped_vmem_limit_kib': '81920'}),
    ('vmem112', {'xla_tpu_scoped_vmem_limit_kib': '114688'}),
    ('lhs_off', {'xla_tpu_scoped_vmem_limit_kib': '81920',
                 'xla_tpu_enable_latency_hiding_scheduler': 'false'}),
    ('lhs_on', {'xla_tpu_scoped_vmem_limit_kib': '81920',
                'xla_tpu_enable_latency_hiding_scheduler': 'true'}),
    ('no_min_fusion', {'xla_tpu_scoped_vmem_limit_kib': '81920',
                       'xla_enable_async_all_gather': 'true'}),
    ('flash_opt', {'xla_tpu_scoped_vmem_limit_kib': '81920',
                   'xla_tpu_licm_size_inflation_ratio': '1.0'}),
]


def main():
    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import (pack_grouped_params,
                                       rrdbnet_apply_fast)

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    LR_SIZE, SCALE, BATCH, N_ITERS = 128, 4, 128, 8
    cem = CEM.create(CEMConf(scale_factor=SCALE))
    filt = cem.device_filters(3)
    g = RRDBNet(nb=23, latent_channels=3)
    lr1 = jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32)
    z1 = jnp.zeros((1, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), lr1, z1)
    packed = pack_grouped_params(params)

    def g_apply(pk, x, zz):
        return rrdbnet_apply_fast(None, x, zz, packed=pk,
                                  dtype=jnp.bfloat16)

    wrapped = cem_wrap(g_apply, filt, upscale=SCALE)
    lr = jnp.zeros((BATCH, LR_SIZE, LR_SIZE, 3), jnp.float32)
    z = jnp.zeros((BATCH, LR_SIZE * SCALE, LR_SIZE * SCALE, 3),
                  jnp.float32)

    def run_n(pk, lr, z):
        def body(carry, _):
            out = jnp.clip(wrapped(pk, lr + 0.0 * carry, z,
                                   cem.invalidity_margins_lr,
                                   pre_pad=False), 0.0, 1.0)
            return out.mean(), None
        final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=N_ITERS)
        return final

    lowered = jax.jit(run_n).lower(packed, lr, z)
    for name, flags in FLAG_SETS:
        try:
            t0 = time.perf_counter()
            fn = lowered.compile(compiler_options=flags)
            tc = time.perf_counter() - t0
            float(fn(packed, lr, z))
            t0 = time.perf_counter()
            float(fn(packed, lr, z))
            dt = time.perf_counter() - t0
            print(json.dumps({'flags': name,
                              'img_per_s': round(BATCH * N_ITERS / dt, 1),
                              'compile_s': round(tc, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({'flags': name, 'error': str(e)[:150]}),
                  flush=True)


if __name__ == '__main__':
    main()
