"""Microbench the RDB stage-4 epilogue variants at trunk shape (b128).

Trace finding (r3): the stage-4 fusion — conv(c3, w4[32->64]) + gather of
four 64-wide slices from the 192/160/128/96-wide P buffers + residual —
runs at ~24 TF/s (3.15 ms/RDB) while the other grouped convs hit
86-152 TF/s.  Candidates:

  A  current: conv 32->64 + 4 strided slice-adds + residual
  B  conv 32->128 (padded N, discard upper half) + slice-adds + residual
  C  dense: conv(concat195, 195->64) + residual (concat build included)
  D  conv 32->64 pure (no gather) — isolates conv vs gather cost
  E  slice-adds alone (no conv) — isolates gather cost
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

    B, H, W = 128, 128, 128
    nf, gc, nz = 64, 32, 3
    N_IT = 20
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # P buffers as produced by the grouped convs (widths 192,160,128,96)
    P0 = jax.random.normal(key, (B, H, W, 192), dt)
    P1 = jax.random.normal(key, (B, H, W, 160), dt)
    P2 = jax.random.normal(key, (B, H, W, 128), dt)
    P3 = jax.random.normal(key, (B, H, W, 96), dt)
    c3 = jax.random.normal(key, (B, H, W, gc), dt)
    x = jax.random.normal(key, (B, H, W, nf), dt)
    cat195 = jax.random.normal(key, (B, H, W, nz + nf + 4 * gc), dt)
    w64 = jax.random.normal(key, (3, 3, gc, nf), dt)
    w128 = jax.random.normal(key, (3, 3, gc, 2 * nf), dt)
    wd = jax.random.normal(key, (3, 3, nz + nf + 4 * gc, nf), dt)

    def timed(name, fn, *args, flops=None):
        def run(*a):
            def body(carry, _):
                out = fn(*a, carry)
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
        except Exception as e:
            print(json.dumps({'name': name,
                              'error': str(e)[:160]}), flush=True)
            return
        rec = {'name': name, 'ms': round(ms, 3)}
        if flops:
            rec['tflops'] = round(flops / ms / 1e9, 1)
        print(json.dumps(rec), flush=True)

    c_flops = 2 * 9 * B * H * W * gc * nf

    def A(P0, P1, P2, P3, c3, x, eps):
        acc = conv(c3 + eps.astype(dt), w64)
        out = (acc + P0[..., 128:192] + P1[..., 96:160]
               + P2[..., 64:128] + P3[..., 32:96])
        return out * jnp.asarray(0.2, dt) + x

    timed('A_current', A, P0, P1, P2, P3, c3, x, flops=c_flops)

    def B_(P0, P1, P2, P3, c3, x, eps):
        acc = conv(c3 + eps.astype(dt), w128)[..., :nf]
        out = (acc + P0[..., 128:192] + P1[..., 96:160]
               + P2[..., 64:128] + P3[..., 32:96])
        return out * jnp.asarray(0.2, dt) + x

    timed('B_padN', B_, P0, P1, P2, P3, c3, x, flops=c_flops)

    def C_(cat, x, eps):
        acc = conv(cat + eps.astype(dt), wd)
        return acc * jnp.asarray(0.2, dt) + x

    timed('C_dense195', C_, cat195, x,
          flops=2 * 9 * B * H * W * (nz + nf + 4 * gc) * nf)

    def D_(c3, eps):
        return conv(c3 + eps.astype(dt), w64)

    timed('D_conv_only', D_, c3, flops=c_flops)

    def E_(P0, P1, P2, P3, x, eps):
        out = (P0[..., 128:192] + P1[..., 96:160]
               + P2[..., 64:128] + P3[..., 32:96] + eps.astype(dt))
        return out * jnp.asarray(0.2, dt) + x

    timed('E_gather_only', E_, P0, P1, P2, P3, x)

    # F: conv + CONTIGUOUS 64-wide adds (as if final slices were their own
    # buffers) — tests whether slice alignment is the problem
    F0 = jax.random.normal(key, (B, H, W, nf), dt)
    F1 = jax.random.normal(key, (B, H, W, nf), dt)
    F2 = jax.random.normal(key, (B, H, W, nf), dt)
    F3 = jax.random.normal(key, (B, H, W, nf), dt)

    def F_(F0, F1, F2, F3, c3, x, eps):
        acc = conv(c3 + eps.astype(dt), w64)
        out = acc + F0 + F1 + F2 + F3
        return out * jnp.asarray(0.2, dt) + x

    timed('F_contig_adds', F_, F0, F1, F2, F3, c3, x, flops=c_flops)


if __name__ == '__main__':
    main()
