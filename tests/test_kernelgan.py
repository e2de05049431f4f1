"""KernelGAN tests: kernel composition, post-processing, short estimation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.kernelgan.kernelgan import (KernelGAN, KernelGANConfig,
                                      KGGenerator, generator_kernel,
                                      zeroize_negligible, kernel_shift,
                                      post_process_kernel,
                                      analytic_x4_kernel, BICUBIC_K8,
                                      gradient_prob_map)


def test_generator_kernel_composition():
    """The deep-linear G is exactly 'correlate with the composed kernel,
    stride-2 subsample' (kernelGAN.py:58-63 equivalence)."""
    cfg = KernelGANConfig(g_chan=8)
    g = KGGenerator(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    params = g.init(jax.random.PRNGKey(0), x)
    k = generator_kernel(params, cfg)
    assert k.shape == (13, 13)
    out_g = g.apply(params, x)
    # identity: G(x) == correlate(x, k) stride-2 (k is the correlation
    # kernel, matching the reference's curr_k convention)
    out_direct = jax.lax.conv_general_dilated(
        x, k[:, :, None, None], (2, 2), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_direct),
                               atol=2e-5)


def test_bicubic_k8_constant():
    assert BICUBIC_K8.shape == (8, 8)
    assert abs(BICUBIC_K8.sum() - 1.0) < 1e-6


def test_zeroize_and_shift():
    rng = np.random.default_rng(0)
    k = rng.uniform(size=(13, 13))
    k = k / k.sum()
    zk = zeroize_negligible(k, n=40)
    assert abs(zk.sum() - 1.0) < 1e-9
    assert (zk == 0).sum() > 0
    sk = kernel_shift(zk, sf=2)
    from scipy.ndimage import center_of_mass
    com = np.array(center_of_mass(sk))
    wanted = np.array(sk.shape) // 2 + 0.5 * (2 - np.array(sk.shape) % 2)
    np.testing.assert_allclose(com, wanted, atol=0.05)


def test_analytic_x4():
    k = np.zeros((13, 13))
    k[6, 6] = 1.0  # delta x2 kernel -> x4 kernel is also ~delta
    k4 = analytic_x4_kernel(k)
    assert abs(k4.sum() - 1.0) < 1e-9
    assert k4.max() == k4[k4.shape[0] // 2, k4.shape[1] // 2]


def test_gradient_prob_map():
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:, :] = 1.0  # single strong edge
    pm = gradient_prob_map(img, 16)
    assert abs(pm.sum() - 1.0) < 1e-9
    # mass concentrates near the edge column
    pm2 = pm.reshape(64, 64)
    assert pm2[:, 30:34].sum() > 0.9


@pytest.mark.slow
def test_short_estimation_runs():
    cfg = KernelGANConfig(max_iters=40, g_chan=16, d_chan=16, d_n_layers=3)
    kg = KernelGAN(cfg, seed=0)
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    k = kg.estimate(img)
    assert k.ndim == 2 and np.isfinite(k).all()
    assert abs(k.sum() - 1.0) < 1e-3
