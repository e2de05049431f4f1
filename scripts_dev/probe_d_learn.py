"""Probe: can the run50k D config learn to separate trivially different
distributions under the exact _d_grads double-forward + BN-stats pattern?

The 50k run's D sat at Correctly_distinguished~0.5 / D_logits_diff~0.003
for 11k steps (lr_D=1e-5, wgan-gp, DiscriminatorVGG128 nf=32 nb=10
strides=2 on 48x48 inputs). This isolates {D arch + loss + optimizer}
from the SR task: real = smooth gradients, fake = same + strong noise.

FINDING (2026-08-19): with the pre-fix patch head — final 1x1 logit conv
followed by BatchNorm+lrelu, faithful to the reference's pseudo_FC_conv1
(architecture.py:501) — the probe could NOT separate these trivially
different distributions at ANY learning rate (diff pinned at ~+-0.005,
correct ~0.5 at lr 1e-5 AND 1e-4 after 400 steps): a batch-stat BN on
the logit pins the batch mean, so real/fake means are structurally
inseparable. The fixed head (norm/act-free logit conv,
discriminators.py pseudo_fc1) separates within ~100 steps. The FC head
(num_2_strides=5) never had the flaw — both are probed below.

Run: JAX_PLATFORMS=cpu python scripts_dev/probe_d_learn.py
"""
import os
import sys
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from exsr.models.discriminators import DiscriminatorVGG128
from exsr.losses import losses as L

D_IN = 48
BATCH = 16
GP_W = 10.0


def make_batch(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    # real: smooth low-freq images; fake: real + visible high-freq noise
    base = jax.random.uniform(k1, (BATCH, 8, 8, 3))
    real = jax.image.resize(base, (BATCH, D_IN, D_IN, 3), 'bilinear')
    fake = jnp.clip(
        real + 0.1 * jax.random.normal(k2, real.shape), 0, 1)
    return real, fake, k3


def run(num_2_strides):
    d = DiscriminatorVGG128(base_nf=32, nb=10,
                            num_2_strides=num_2_strides,
                            input_patch_size=D_IN)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, D_IN, D_IN, 3))
    d_vars = dict(d.init(rng, x0))

    def d_forward(d_vars, x, update_stats):
        # mirror flax_d_adapter: train mode always normalizes by batch
        # statistics; pass mutable and drop the update when not wanted
        out, st = d.apply(d_vars, x, train=True, mutable=['batch_stats'])
        return out, (dict(st) if update_stats else {})

    for lr in (1e-5, 1e-4):
        tx = optax.adam(lr, b1=0.9, b2=0.999)
        params = jax.tree.map(lambda a: a, d_vars['params'])
        stats = {k: v for k, v in d_vars.items() if k != 'params'}
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state, rng):
            real, fake, rng = make_batch(rng)

            def loss_fn(p):
                dv = dict(stats, params=p)
                pred_real, new_stats = d_forward(dv, real, True)
                pred_fake, new_stats = d_forward(
                    dict(dv, **new_stats), fake, True)
                l_real = 2 * L.gan_loss('wgan-gp', pred_real, True)
                l_fake = 2 * L.gan_loss('wgan-gp', pred_fake, False)
                loss = (l_real + l_fake) / 2
                gp = L.gradient_penalty(
                    lambda x: d_forward(dv, x, False)[0],
                    real, fake, rng)
                loss = loss + GP_W * gp
                diff = (pred_real - pred_fake).reshape(BATCH, -1).mean(1)
                return loss, (new_stats, diff.mean(), (diff > 0).mean())

            (_, (new_stats, diff, corr)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, upd)
            return params2, dict(new_stats), opt_state2, rng, diff, corr

        rng_i = jax.random.PRNGKey(1)
        print(f'--- num_2_strides={num_2_strides} lr_D={lr}')
        for i in range(401):
            params, stats, opt_state, rng_i, diff, corr = step(
                params, stats, opt_state, rng_i)
            if i % 50 == 0:
                print(f'step {i:4d} diff={float(diff):+.5f} '
                      f'correct={float(corr):.3f}', flush=True)


if __name__ == '__main__':
    for s in (2, 5):
        run(s)
