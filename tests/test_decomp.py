"""Explorable-JPEG trainer tests (tiny DnCNN, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.models.dncnn import DnCNN, DnCNNConfig, DnCNNDiscriminator
from exsr.train.decomp import (DecompTrainer, DecompConfig,
                               repeat_z_3_channels, z_to_3_channels)
from exsr.train.srragan import flax_d_adapter
from exsr.jpeg.codec import JPEGCodec


@pytest.fixture(scope='module')
def setup():
    cfg = DecompConfig(latent_channels=64, optimal_z_iters=2,
                       dct_premult_d=True)
    gcfg = DnCNNConfig(n_channels=16, depth=3,
                       num_latent_channels=cfg.num_latent_channels)
    g = DnCNN(gcfg)
    d = DnCNNDiscriminator(n_channels=16, depth=3, expected_input_size=8,
                           norm='layer')
    coeffs0 = jnp.zeros((1, 8, 8, 64))
    z0 = jnp.zeros((1, 8, 8, 64))
    g_vars = g.init(jax.random.PRNGKey(0), coeffs0, z0)
    d_vars = dict(d.init(jax.random.PRNGKey(1), coeffs0))

    def g_apply(params, coeffs, z):
        out = g.apply(params, coeffs, z, train=True,
                      mutable=['batch_stats'])[0] \
            if 'batch_stats' in params else g.apply(params, coeffs, z)
        return out

    trainer = DecompTrainer(cfg, g_apply, flax_d_adapter(d))
    return trainer, g_vars, d_vars


def _batch(b=2, size=64, seed=0):
    rng = np.random.default_rng(seed)
    return {'uncomp': jnp.asarray(
        (255 * rng.uniform(size=(b, size, size, 1))).astype(np.float32)),
        'qf': jnp.asarray(rng.integers(5, 50, size=(b,)).astype(np.int32))}


def test_decomp_d_and_g_steps(setup):
    trainer, g_vars, d_vars = setup
    state = trainer.init_state(g_vars, d_vars, jax.random.PRNGKey(2))
    batch = _batch()
    state1, dm = trainer.d_step(state, batch, dual=False)
    assert np.isfinite(float(dm['l_d_total']))
    state2, gm = trainer.g_step(state1, batch, dual=True, use_gan=True)
    for k in ('l_g_total', 'l_g_range', 'l_g_optimalZ'):
        assert np.isfinite(float(gm[k])), k


def test_decomp_output_is_bin_consistent(setup):
    """The generator's output coefficients always stay inside the input's
    quantization bins — consistency by construction
    (architecture.py:204-214)."""
    trainer, g_vars, d_vars = setup
    batch = _batch(seed=3)
    codec = JPEGCodec()
    qf = batch['qf'].astype(jnp.float32)
    comp = codec.compress(batch['uncomp'], qf, quantize=True)
    z = jnp.zeros(comp.shape[:3] + (64,))
    out = trainer.g_apply(g_vars, comp, z)
    assert float(jnp.abs(out - comp).max()) <= 0.5 + 1e-5


def test_repeat_z_round_trip():
    rng = np.random.default_rng(0)
    z3 = jnp.asarray(rng.uniform(-1, 1, size=(1, 4, 4, 3))
                     .astype(np.float32))
    z64 = repeat_z_3_channels(z3, 64)
    assert z64.shape[-1] == 64
    back = z_to_3_channels(z64)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z3), atol=1e-6)


def test_g_step_updates_bn_running_stats():
    """The torch reference updates BN running stats on every train-mode
    forward (netG.train()); with flax they must be threaded through the
    g_step explicitly (g_stats_apply) or eval-mode inference silently
    runs on the INIT stats (mean 0 / var 1) — the bug that made a
    trained checkpoint score worse than plain JPEG through eval_jpeg."""
    cfg = DecompConfig(latent_channels=64, optimal_z_iters=2,
                       dct_premult_d=True)
    gcfg = DnCNNConfig(n_channels=16, depth=3,
                       num_latent_channels=cfg.num_latent_channels)
    g = DnCNN(gcfg)
    d = DnCNNDiscriminator(n_channels=16, depth=3, expected_input_size=8,
                           norm='layer')
    coeffs0 = jnp.zeros((1, 8, 8, 64))
    z0 = jnp.zeros((1, 8, 8, 64))
    g_vars = dict(g.init(jax.random.PRNGKey(0), coeffs0, z0))
    assert 'batch_stats' in g_vars, 'BN generator expected'
    d_vars = dict(d.init(jax.random.PRNGKey(1), coeffs0))

    def g_apply(params, coeffs, z):
        return g.apply(params, coeffs, z, train=True,
                       mutable=['batch_stats'])[0]

    def g_stats_apply(params, coeffs, z):
        out, mut = g.apply(params, coeffs, z, train=True,
                           mutable=['batch_stats'])
        return out, mut['batch_stats']

    trainer = DecompTrainer(cfg, g_apply, flax_d_adapter(d),
                            g_stats_apply=g_stats_apply)
    state = trainer.init_state(g_vars, d_vars, jax.random.PRNGKey(2))
    before = jax.tree.map(np.asarray, g_vars['batch_stats'])
    state, _ = trainer.g_step(state, _batch(), dual=False, use_gan=False)
    after = jax.tree.map(np.asarray, state.g_params['batch_stats'])
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), before, after))
    assert max(diffs) > 1e-6, 'running stats did not move'
