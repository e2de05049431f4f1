"""Probe: large-batch throughput with a batch-chunked HR tail + CEM.

The b>=160 OOM was driven by two live [B, 512, 512, 64] bf16 HR-tail
buffers; chunking the tail (and the CEM enforce) over the batch caps that
memory so the FLOP-dominant trunk can run in the batch regime where v5e
conv rates keep rising.  One JSON line per (batch, chunk) point.
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
    from exsr.cem.cem import CEM, CEMConf
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import (pack_grouped_params, rrdb_tail_fast,
                                       rrdb_trunk_fast)

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    LR_SIZE, SCALE, N_ITERS = 128, 4, 8
    cem = CEM.create(CEMConf(scale_factor=SCALE))
    filt = cem.device_filters(3)
    g = RRDBNet(nb=23, latent_channels=3)
    lr1 = jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32)
    z1 = jnp.zeros((1, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), lr1, z1)
    packed = pack_grouped_params(params)

    compiler_opts = {'xla_tpu_scoped_vmem_limit_kib': '81920'}

    points = [tuple(map(int, a.split('x'))) for a in sys.argv[1:]] or [
        (160, 32), (192, 32), (256, 32)]

    for batch, chunk in points:
        lr = jnp.zeros((batch, LR_SIZE, LR_SIZE, 3), jnp.float32)
        z = jnp.zeros((batch, LR_SIZE * SCALE, LR_SIZE * SCALE, 3),
                      jnp.float32)

        def fwd(pk, lr, z):
            feats = rrdb_trunk_fast(pk, lr, z, dtype=jnp.bfloat16)
            if chunk >= batch:
                gen = rrdb_tail_fast(pk, feats, z,
                                     out_dtype=jnp.float32)
                return jnp.clip(filt.enforce(lr, gen), 0.0, 1.0)
            k = batch // chunk

            def tail_cem(args):
                f, lrc, zc = args
                gen = rrdb_tail_fast(pk, f, zc, out_dtype=jnp.float32)
                return jnp.clip(filt.enforce(lrc, gen), 0.0, 1.0)

            outs = jax.lax.map(tail_cem, (
                feats.reshape((k, chunk) + feats.shape[1:]),
                lr.reshape((k, chunk) + lr.shape[1:]),
                z.reshape((k, chunk) + z.shape[1:])))
            return outs.reshape((batch,) + outs.shape[2:])

        def run_n(pk, lr, z):
            def body(carry, _):
                out = fwd(pk, lr + 0.0 * carry, z)
                return out.mean(), None
            final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=N_ITERS)
            return final

        try:
            t_c0 = time.perf_counter()
            lowered = jax.jit(run_n).lower(packed, lr, z)
            try:
                fn = lowered.compile(compiler_options=compiler_opts)
            except Exception:
                fn = lowered.compile()
            t_c1 = time.perf_counter()
            float(fn(packed, lr, z))  # warm
            t0 = time.perf_counter()
            float(fn(packed, lr, z))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(json.dumps({'batch': batch, 'chunk': chunk,
                              'error': f'{type(e).__name__}: {e}'[:200]}),
                  flush=True)
            continue
        print(json.dumps({
            'batch': batch, 'chunk': chunk,
            'img_per_s': round(batch * N_ITERS / dt, 1),
            'ms_per_fwd': round(1000 * dt / N_ITERS, 1),
            'compile_s': round(t_c1 - t_c0, 1)}), flush=True)


if __name__ == '__main__':
    main()
