"""Headline benchmark: 4x SR throughput on 128x128 LR inputs (img/s/chip).

Baseline target (BASELINE.md): > 200 img/s/chip on TPU v5e with the full
23-block CEM-wrapped explorable generator.  Prints ONE JSON line.

Measurement note: on the axon-tunneled platform ``block_until_ready`` does
not reliably synchronize with device execution, so the timed region chains
N forwards inside one jitted scan and fetches a dependent scalar — the wall
time provably covers all N executions.
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet

    BATCH = 8
    LR_SIZE = 128
    SCALE = 4
    N_ITERS = 10

    cem = CEM.create(CEMConf(scale_factor=SCALE))
    filt = cem.device_filters(3)  # separable 1-D CEM filter chain
    # bf16 trunk (params fp32): the CEM chain downstream stays fp32, so the
    # consistency guarantee is unaffected by the generator's compute dtype
    g = RRDBNet(nb=23, latent_channels=3, dtype=jnp.bfloat16)
    lr = jnp.zeros((BATCH, LR_SIZE, LR_SIZE, 3), jnp.float32)
    z = jnp.zeros((BATCH, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), lr[:1], z[:1])
    wrapped = cem_wrap(lambda p, x, zz: g.apply(p, x, zz), filt,
                       upscale=SCALE)

    @jax.jit
    def run_n(params, lr, z):
        def body(carry, _):
            out = jnp.clip(wrapped(params, lr + 0.0 * carry, z,
                                   cem.invalidity_margins_lr,
                                   pre_pad=False), 0.0, 1.0)
            return out.mean(), None
        final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=N_ITERS)
        return final

    float(run_n(params, lr, z))  # compile + warm
    t0 = time.perf_counter()
    float(run_n(params, lr, z))  # dependent-scalar fetch = true sync
    dt = time.perf_counter() - t0
    imgs_per_s = BATCH * N_ITERS / dt
    print(json.dumps({
        'metric': 'sr4x_throughput_128px',
        'value': round(imgs_per_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(imgs_per_s / 200.0, 3),
    }))


if __name__ == '__main__':
    main()
