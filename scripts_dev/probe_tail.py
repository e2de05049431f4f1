"""Microbench the HR tail variants at b128 (trace: two [128,512,512,64]
compare_select passes ~29 ms/fwd suggest the hr-conv input concats block
lrelu/conv fusion; z-split convs avoid materializing the 4.5 GB concat).

  A  current tail: subpixel upconvs + concat([z,x]) hr convs
  B  z-split hr convs: conv(x,wx)+conv(z,wz) — no concat
  C  B + CEM enforce (the full post-trunk cost)
  A2 A + CEM enforce
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
    from exsr.models.rrdb_fast import fold_upconv_kernel, subpixel_upconv

    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    B, H, W, nf, nz = 128, 128, 128, 64, 3
    N_IT = 20
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (B, H, W, nf), dt)
    z_hr = jax.random.normal(key, (B, 4 * H, 4 * W, nz), dt)
    lr = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    k_up0 = jax.random.normal(key, (3, 3, nf, nf), dt) * 0.1
    k_up1 = jax.random.normal(key, (3, 3, nf, nf), dt) * 0.1
    k_h0 = jax.random.normal(key, (3, 3, nz + nf, nf), dt) * 0.1
    k_h1 = jax.random.normal(key, (3, 3, nz + nf, 3), dt) * 0.1
    b0 = jnp.zeros((nf,), dt)
    b1 = jnp.zeros((3,), dt)

    cem = CEM.create(CEMConf(scale_factor=4))
    filt = cem.device_filters(3)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def up(x, k):
        return jax.nn.leaky_relu(
            subpixel_upconv(x, fold_upconv_kernel(k)), 0.2)

    def tail_concat(f, z):
        x = up(f, k_up0)
        x = up(x, k_up1)
        x = jax.nn.leaky_relu(
            conv(jnp.concatenate([z, x], -1), k_h0) + b0, 0.2)
        x = conv(jnp.concatenate([z, x], -1), k_h1) + b1
        return x.astype(jnp.float32)

    def tail_split(f, z):
        x = up(f, k_up0)
        x = up(x, k_up1)
        x = jax.nn.leaky_relu(
            conv(x, k_h0[:, :, nz:]) + conv(z, k_h0[:, :, :nz]) + b0, 0.2)
        x = conv(x, k_h1[:, :, nz:]) + conv(z, k_h1[:, :, :nz]) + b1
        return x.astype(jnp.float32)

    def timed(name, fn, *args):
        def run(*a):
            def body(carry, _):
                out = fn(a[0] + 0.0 * carry.astype(dt), *a[1:])
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
            print(json.dumps({'name': name, 'ms': round(ms, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({'name': name, 'error': str(e)[:160]}),
                  flush=True)

    timed('A_tail_concat', tail_concat, feats, z_hr)
    timed('B_tail_split', tail_split, feats, z_hr)

    def with_cem(tail):
        def fn(f, z, lr):
            gen = tail(f, z)
            return jnp.clip(filt.enforce(lr, gen), 0.0, 1.0)
        return fn

    timed('A2_tail_concat_cem', with_cem(tail_concat), feats, z_hr, lr)
    timed('C_tail_split_cem', with_cem(tail_split), feats, z_hr, lr)


if __name__ == '__main__':
    main()
