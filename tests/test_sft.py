"""SFT-GAN generator (sft_arch.py:8-85) — shape + param-count parity."""
import jax
import jax.numpy as jnp
import numpy as np

from exsr.models.sft import SFTNet, _depth_to_space


def test_sftnet_shapes_and_param_count():
    m = SFTNet()
    img = jnp.zeros((1, 24, 24, 3))
    seg = jnp.zeros((1, 96, 96, 8))
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), img, seg)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # torch arithmetic over sft_arch.py:40-85 (16 ResBlock_SFT at 86,528
    # each + cond net + HR branch + final SFT/conv)
    assert n == 1_833_763
    out = jax.eval_shape(
        m.apply,
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params),
        img, seg)
    assert out.shape == (1, 96, 96, 3)


def test_sftnet_forward_and_cond_sensitivity():
    m = SFTNet(n_blocks=2)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 12, 12, 3))
    seg = jax.nn.one_hot(
        jax.random.randint(key, (1, 48, 48), 0, 8), 8)
    params = m.init(jax.random.PRNGKey(1), img, seg)
    out = m.apply(params, img, seg)
    assert out.shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(out)).all()
    seg2 = jnp.roll(seg, 1, axis=-1)
    out2 = m.apply(params, img, seg2)
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_depth_to_space_matches_torch_pixelshuffle():
    torch = __import__('torch')
    x = np.random.default_rng(0).normal(size=(2, 3, 4, 8)).astype('f')
    ours = np.asarray(_depth_to_space(jnp.asarray(x), 2))
    ref = torch.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)
