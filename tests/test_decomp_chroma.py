"""Chroma JPEG trainer smoke tests (tiny nets, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.models.dncnn import DnCNN, DnCNNConfig, DnCNNDiscriminator
from exsr.train.decomp import DecompConfig
from exsr.train.decomp_chroma import ChromaDecompTrainer, regroup_y_coeffs_16
from exsr.train.srragan import flax_d_adapter


def test_regroup_y_coeffs():
    x = jnp.arange(2 * 4 * 4 * 64).reshape(2, 4, 4, 64).astype(jnp.float32)
    out = regroup_y_coeffs_16(x)
    assert out.shape == (2, 2, 2, 256)
    # first 16x16 cell groups blocks (0,0),(0,1),(1,0),(1,1)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0, :64]),
                                  np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0, 64:128]),
                                  np.asarray(x[0, 0, 1]))


@pytest.fixture(scope='module')
def chroma_setup():
    cfg = DecompConfig(latent_channels=0, chroma_mode=True,
                       optimal_z_weight=100.0)
    gy = DnCNN(DnCNNConfig(n_channels=8, depth=2, num_latent_channels=0))
    gc = DnCNN(DnCNNConfig(n_channels=8, depth=2, in_nc=256 + 128,
                           out_nc=128, num_latent_channels=0,
                           chroma_generator=True, block_size=8))
    d = DnCNNDiscriminator(n_channels=8, depth=2, expected_input_size=2,
                           norm='layer', out_nc=8)
    y8 = jnp.zeros((1, 4, 4, 64))
    gy_vars = gy.init(jax.random.PRNGKey(0), y8, None)
    packed = jnp.zeros((1, 2, 2, 256 + 128))
    gc_vars = gc.init(jax.random.PRNGKey(1), packed, None)
    d_vars = dict(d.init(jax.random.PRNGKey(2),
                         jnp.zeros((1, 2, 2, 256 + 128))))

    def gy_apply(coeffs, z):
        return gy.apply(gy_vars, coeffs, None, train=False,
                        mutable=['batch_stats'])[0] \
            if 'batch_stats' in gy_vars else gy.apply(gy_vars, coeffs, None)

    def gc_apply(params, packed, z):
        if 'batch_stats' in params:
            return gc.apply(params, packed, None, train=True,
                            mutable=['batch_stats'])[0]
        return gc.apply(params, packed, None)

    trainer = ChromaDecompTrainer(cfg, gy_apply, gc_apply,
                                  flax_d_adapter(d))
    return trainer, gc_vars, d_vars


def test_chroma_step_runs(chroma_setup):
    trainer, gc_vars, d_vars = chroma_setup
    state = trainer.init_state(dict(gc_vars), d_vars, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    batch = {'uncomp': jnp.asarray(
        (255 * rng.uniform(size=(2, 32, 32, 3))).astype(np.float32)),
        'qf': jnp.asarray(np.array([10, 30], np.int32))}
    state1, metrics = trainer.step_fn(state, batch, use_gan=True)
    for k in ('l_g_total', 'l_g_pix', 'l_d_total'):
        assert np.isfinite(float(metrics[k])), k
    # chroma decode shape
    y = batch['uncomp'][..., :1]
    qf = batch['qf'].astype(jnp.float32)
    y_cond, _ = trainer._fake_y(y, qf, jax.random.PRNGKey(4), mix=False)
    packed, _, _ = trainer._chroma_inputs(batch['uncomp'], y_cond, qf)
    chroma = trainer.decode(state1.gc_params, packed, qf)
    assert chroma.shape == (2, 32, 32, 2)
