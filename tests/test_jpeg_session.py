"""JPEG edit-session tests (tiny DnCNN, CPU)."""
import numpy as np
import pytest

from exsr.apps.jpeg_session import JPEGEditSession


@pytest.fixture(scope='module')
def jsession():
    s = JPEGEditSession(nf=16, nb=3, latent_channels=64, qf=10)
    s.init_random_params(0)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    s.open_image(img)
    return s


def test_open_and_consistency(jsession):
    assert jsession.out.shape == (1, 64, 64, 1)
    # output coefficients stay in the input's quantization bins
    import jax.numpy as jnp
    coeffs = jsession._g_apply(jsession.params, jsession.comp,
                               jnp.asarray(jsession.cur_z))
    assert float(jnp.abs(coeffs - jsession.comp).max()) <= 0.5 + 1e-5


def test_uniform_z3_and_undo(jsession):
    out0 = jsession.out.copy()
    jsession.set_region(np.ones((64, 64), np.float32))
    jsession.set_uniform_z3([0.9, -0.4, 0.2])
    assert np.abs(jsession.out - out0).max() > 1e-7
    jsession.undo()
    np.testing.assert_allclose(jsession.out, out0, atol=1e-6)


def test_optimize_std(jsession):
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    jsession.set_region(mask)
    res = jsession.optimize('max_STD', max_iters=10)
    assert np.isfinite(res['losses']).all()


def test_open_real_coefficients(jsession):
    from exsr.jpeg.codec import LUMA_Q_TABLE
    rng = np.random.default_rng(1)
    coeffs = np.round(rng.normal(0, 2, size=(8, 8, 64))).astype(np.float32)
    out = jsession.open_coefficients(coeffs, LUMA_Q_TABLE.astype(float))
    assert out.shape == (1, 64, 64, 1)
    assert 49 < jsession.qf < 51  # the base table corresponds to QF 50


@pytest.mark.slow
def test_find_optimal_imprint_mask():
    import numpy as np
    from exsr.apps.jpeg_session import JPEGEditSession

    s = JPEGEditSession(nf=32, nb=3, qf=20)
    s.init_random_params(0)
    rng = np.random.default_rng(0)
    s.open_image(rng.uniform(size=(96, 96, 3)).astype(np.float32))
    des = np.zeros((64, 64), np.float32)
    des[20:44, 20:44] = 220.0
    mask = np.zeros((64, 64), np.float32)
    mask[20:44, 20:44] = 1.0
    rect = [18, 18, 28, 28]
    best, refined = s.find_optimal_imprint_mask(
        des, mask, rect, top_left=(32, 32), target_dims=(24, 24))
    # in-bounds, >= 4px sides, overlap constraint respected
    assert (best[:2] >= 0).all() and (best[2:] >= 4).all()
    assert best[0] + best[2] <= 64 and best[1] + best[3] <= 64
    win = mask[best[1]:best[1] + best[3], best[0]:best[0] + best[2]]
    rect_mask_mean = mask[rect[1]:rect[1] + rect[3],
                          rect[0]:rect[0] + rect[2]].mean()
    assert win.mean() >= 0.5 * rect_mask_mean - 1e-6
    # refined mask confined to the winning rectangle and non-empty
    assert refined.sum() > 0
    outside = refined.copy()
    outside[best[1]:best[1] + best[3], best[0]:best[0] + best[2]] = 0
    assert outside.sum() == 0


def test_trained_chroma_decode_path():
    """attach_chroma: CbCr reconstructed by the chroma generator
    conditioned on the EDITED Y (USE_Y_GENERATOR_4_CHROMA,
    DecompCNN_model.py:23,711-729) — color output follows Y edits."""
    import jax
    import jax.numpy as jnp
    from exsr.apps.jpeg_session import JPEGEditSession
    s = JPEGEditSession(nf=16, nb=3, latent_channels=64, qf=10)
    s.init_random_params(0)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    s.open_image(img)
    s.attach_chroma(None, nf=16, nb=2)  # builds the chroma model config
    s.chroma_params = s.chroma_generator.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, 2, 256 + 128)),
        jnp.zeros((1, 2, 2, 0)))
    rgb0 = s.compose_rgb()
    assert rgb0.shape == (32, 32, 3)
    # not a grayscale replicate: channels genuinely differ
    assert np.abs(rgb0[..., 0] - rgb0[..., 2]).max() > 1e-3
    cbcr0 = s.decode_chroma()
    assert cbcr0.shape == (32, 32, 2)
    # chroma is conditioned on the edited Y: a Y edit changes CbCr
    s.set_uniform_z3([0.9, -0.9, 0.5])
    cbcr1 = s.decode_chroma()
    assert np.abs(cbcr1 - cbcr0).max() > 1e-6
