"""Where does the small-config train-step time go? (r4 long-run planning)

The run50k smoke measured ~1.26 init-steps/s at nb=8/nf=32/patch128/b16 —
slower than the FLAGSHIP's 1.24/s despite ~30x less G compute, implicating
per-call host overhead (axon-tunnel dispatch + feed) rather than device
compute.  This probe times, on a fixed resident device batch:

  a) the CLI's per-call path: one jitted g_step per host call, N times;
  b) the same step chained K times inside one jitted lax.scan (same math,
     same donation pattern) — the fused multi-step block the scan trainer
     rides (exsr/train/fused.py).

If (a) >> (b)/K, the host loop is the bottleneck and a 50k-step run needs
the fused block.
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

    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.models.discriminators import DiscriminatorVGG128
    from exsr.parallel.mesh import make_mesh, ShardingRules
    from exsr.train.srragan import (SRRaGANTrainer, TrainConfig,
                                    flax_d_adapter)

    scale, patch, batch = 4, 128, 16
    cem = CEM.create(CEMConf(scale_factor=scale))
    filt = cem.device_filters(3)
    m_hr = cem.invalidity_margins_hr
    g = RRDBNet(nb=8, nf=32, gc=16, latent_channels=3)
    d = DiscriminatorVGG128(base_nf=32, nb=10, num_2_strides=2,
                            input_patch_size=patch - 2 * m_hr)
    lr_p = patch // scale
    g_params = g.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, lr_p, lr_p, 3)),
                      jnp.zeros((1, patch, patch, 3)))
    d_vars = dict(d.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, patch - 2 * m_hr,
                                    patch - 2 * m_hr, 3))))
    wrapped = cem_wrap(lambda p, x, z: g.apply(p, x, z), filt, upscale=scale)
    g_apply = lambda p, x, z: wrapped(p, x, z, 0, pre_pad=False)
    # init-phase config (the smoke's phase): pixel+range only
    cfg = TrainConfig(scale=scale, patch_size=patch, pixel_weight=1.0,
                      gan_weight=0.0, optimal_z_weight=None,
                      latent_weight=None, lr_g=2e-4)
    mesh = make_mesh(data=1, spatial=1, devices=jax.devices()[:1])
    trainer = SRRaGANTrainer(cfg, g_apply, flax_d_adapter(d),
                             margins_hr=m_hr, rules=ShardingRules(mesh))
    state = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(2))

    hr = jax.random.uniform(jax.random.PRNGKey(3), (batch, patch, patch, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(4), (batch, lr_p, lr_p, 3))

    bdict = {'lr': lr, 'hr': hr}
    # (a) per-host-call loop — the CLI's current structure (init phase:
    # dual=False, use_gan=False)
    state, aux = trainer.g_step(state, bdict, False, False)  # compile+warm
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        state, aux = trainer.g_step(state, bdict, False, False)
    float(jax.tree.leaves(aux)[0])
    per_call = (time.perf_counter() - t0) / N
    print(json.dumps({'mode': 'per_host_call_g_step',
                      'ms_per_step': round(per_call * 1e3, 1),
                      'steps_per_s': round(1 / per_call, 2)}), flush=True)

    # (b) K steps chained in one jitted scan over stacked batches
    K = 50
    hrs = jax.random.uniform(jax.random.PRNGKey(5),
                             (K, batch, patch, patch, 3))
    lrs = jax.random.uniform(jax.random.PRNGKey(6),
                             (K, batch, lr_p, lr_p, 3))

    def block(state, hrs, lrs):
        def body(st, xs):
            h, l = xs
            st2, aux = trainer._g_step(st, {'lr': l, 'hr': h}, False, False)
            return st2, aux['l_g_total']
        st, losses = jax.lax.scan(body, state, (hrs, lrs))
        return st, losses

    jb = jax.jit(block, donate_argnums=(0,))
    state2, losses = jb(state, hrs, lrs)
    float(losses[-1])
    state2, losses = jb(state2, hrs, lrs)
    t0 = time.perf_counter()
    state2, losses = jb(state2, hrs, lrs)
    float(losses[-1])
    per_scan = (time.perf_counter() - t0) / K
    print(json.dumps({'mode': 'scan_block_g_step', 'K': K,
                      'ms_per_step': round(per_scan * 1e3, 1),
                      'steps_per_s': round(1 / per_scan, 2)}), flush=True)


if __name__ == '__main__':
    main()
