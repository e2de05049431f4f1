"""Probe v5e int8 MXU conv rates at the RRDB trunk shapes (b128).

The bf16 trunk runs at the per-shape conv speed limit (PROFILE_r03.json:
w0 152 / w1 136 / w2 116 / w3 86 TF/s, epilogue 24).  v5e int8 peak is
~394 TOPS vs 197 TFLOP/s bf16 — if XLA lowers int8 convs onto the int8
MXU path at ~2x, a quantized serving trunk could break the 200 img/s
target that bf16 provably cannot reach on this toolchain.

Measures, per trunk conv shape: bf16 baseline, raw int8 (int32 accum),
and int8 with the full dequant epilogue (scale + bias + lrelu + requant
to int8) that a real quantized trunk needs between stages.
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
    N_IT = 20
    key = jax.random.PRNGKey(0)

    def conv(x, k, prec=None, pt=None):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=pt)

    def timed(name, fn, *args, flops=None):
        # the carry MUST perturb the conv input each iteration, else XLA
        # hoists the loop-invariant conv out of the scan (observed: fake
        # 323 TF/s > the 197 TF/s v5e bf16 peak)
        def run(*a):
            def body(carry, _):
                out = fn(carry, *a)
                return out.astype(jnp.float32).mean(), None
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
            print(json.dumps({'name': name, 'error': str(e)[:200]}),
                  flush=True)
            return
        rec = {'name': name, 'ms': round(ms, 3)}
        if flops:
            rec['tflops'] = round(flops / ms / 1e9, 1)
        print(json.dumps(rec), flush=True)

    # trunk conv shapes: (cin, cout)
    shapes = [('w0', 67, 192), ('w1', 32, 160), ('w2', 32, 128),
              ('w3', 32, 96), ('w4', 32, 64)]
    for nm, cin, cout in shapes:
        flops = 2 * 9 * B * H * W * cin * cout
        xb = jax.random.normal(key, (B, H, W, cin), jnp.bfloat16)
        kb = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        timed(f'{nm}_bf16',
              lambda eps, x, k: conv(x + eps.astype(x.dtype), k),
              xb, kb, flops=flops)

        xi = jax.random.randint(key, (B, H, W, cin), -127, 127,
                                jnp.int8)
        ki = jax.random.randint(key, (3, 3, cin, cout), -127, 127,
                                jnp.int8)
        timed(f'{nm}_int8',
              lambda eps, x, k: conv(
                  (x + jnp.round(eps).astype(jnp.int8)), k, pt=jnp.int32),
              xi, ki, flops=flops)

        # full quantized-stage epilogue: int32 acc -> fp32 scale (per-
        # channel) + bias + lrelu -> requant int8 for the next stage
        sc = jax.random.uniform(key, (cout,), jnp.float32, 1e-3, 1e-2)
        bi = jax.random.normal(key, (cout,), jnp.float32)

        def qstage(eps, x, k, sc=sc, bi=bi):
            x = x + jnp.round(eps).astype(jnp.int8)
            acc = conv(x, k, pt=jnp.int32)
            y = acc.astype(jnp.float32) * sc + bi
            y = jax.nn.leaky_relu(y, 0.2)
            return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(
                jnp.int8)

        timed(f'{nm}_int8_requant', qstage, xi, ki, flops=flops)


if __name__ == '__main__':
    main()
