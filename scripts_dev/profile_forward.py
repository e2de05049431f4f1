"""Capture a jax.profiler device trace of the b128 headline forward and
report the measured per-op time/bytes breakdown (VERDICT r2: replace the
arithmetic HBM budget with a trace-backed one).

Usage: python scripts_dev/profile_forward.py [out_dir]
Writes the raw trace under out_dir and prints a JSON summary.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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

    out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/exsr_trace'
    LR_SIZE, SCALE, BATCH, N_ITERS = 128, 4, 128, 4

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

    compiler_opts = {'xla_tpu_scoped_vmem_limit_kib': '81920'}
    lowered = jax.jit(run_n).lower(packed, lr, z)
    try:
        fn = lowered.compile(compiler_options=compiler_opts)
    except Exception:
        fn = lowered.compile()

    # XLA's own cost analysis: analytic FLOPs + bytes for the whole program
    try:
        ca = fn.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        cost = {'flops': ca.get('flops'),
                'bytes_accessed': ca.get('bytes accessed')}
    except Exception as e:
        cost = {'error': str(e)}

    float(fn(packed, lr, z))  # warm

    jax.profiler.start_trace(out_dir)
    float(fn(packed, lr, z))
    jax.profiler.stop_trace()
    print(json.dumps({'cost_analysis': cost,
                      'trace_dir': out_dir}), flush=True)

    # summarize the trace with the tensorboard profile plugin
    planes = glob.glob(os.path.join(out_dir, 'plugins/profile/*/*xplane.pb'))
    print(json.dumps({'xplanes': planes}), flush=True)


if __name__ == '__main__':
    main()
