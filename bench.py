"""Headline benchmark: 4x SR throughput on 128x128 LR inputs (img/s/chip).

Baseline target (BASELINE.md): > 200 img/s/chip on TPU v5e with the full
23-block CEM-wrapped explorable generator.  Prints ONE JSON line.
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

    import jax.numpy as _jnp
    cem = CEM.create(CEMConf(scale_factor=SCALE))
    filt = cem.device_filters(3)
    # bf16 trunk (params fp32): the CEM chain downstream stays fp32, so the
    # consistency guarantee is unaffected by the generator's compute dtype
    g = RRDBNet(nb=23, latent_channels=3, dtype=_jnp.bfloat16)
    lr = jnp.zeros((BATCH, LR_SIZE, LR_SIZE, 3), jnp.float32)
    z = jnp.zeros((BATCH, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), lr[:1], z[:1])
    wrapped = cem_wrap(lambda p, x, zz: g.apply(p, x, zz), filt,
                       upscale=SCALE)

    @jax.jit
    def forward(params, lr, z):
        return jnp.clip(wrapped(params, lr, z, cem.invalidity_margins_lr,
                                pre_pad=False), 0.0, 1.0)

    out = jax.block_until_ready(forward(params, lr, z))  # compile
    # timed steady-state
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(params, lr, z)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    imgs_per_s = BATCH * n_iters / dt
    print(json.dumps({
        'metric': 'sr4x_throughput_128px',
        'value': round(imgs_per_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(imgs_per_s / 200.0, 3),
    }))


if __name__ == '__main__':
    main()
