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


@pytest.mark.slow
def test_estimation_recovers_known_kernel():
    """VERDICT-r3 next #4: end-to-end estimation quality against ground
    truth.  An LR image is synthesized from a natural image with a KNOWN
    anisotropic Gaussian x2 kernel (the degradation family of
    KernelGAN/util.py gen_kernel); the full estimation must recover a
    kernel whose (a) centered second moments match the true covariance
    and (b) downscale action on the HR image matches the true kernel's —
    the property the GUI's estimated-kernel CEM rebuild depends on
    (GUI.py:1587-1606)."""
    from exsr.kernelgan.kernelgan import (aniso_gaussian_kernel,
                                          kernel_moments)
    from PIL import Image
    img = np.asarray(Image.open(
        '/root/reference/Samples/face_GT_HR.png'))[:, :, :3] / 255.0

    k_true = aniso_gaussian_kernel(13, 2.0, 0.8, 0.6, sf=2)
    hr = jnp.asarray(img.astype(np.float32)).transpose(2, 0, 1)[..., None]
    lr = jax.lax.conv_general_dilated(
        hr, jnp.asarray(k_true.astype(np.float32))[:, :, None, None],
        (2, 2), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    lr_img = np.asarray(lr)[..., 0].transpose(1, 2, 0)

    kg = KernelGAN(KernelGANConfig(max_iters=1500), seed=0)
    k_rec = kg.estimate(lr_img)
    assert np.isfinite(k_rec).all() and abs(k_rec.sum() - 1.0) < 1e-3

    # (a) shape recovery: centered covariance within 35% of truth
    _, cov_t = kernel_moments(k_true)
    _, cov_r = kernel_moments(k_rec)
    rel = np.abs(cov_r - cov_t).max() / np.abs(cov_t).max()
    assert rel < 0.35, (cov_t.ravel(), cov_r.ravel())

    # (b) operator action: downscaling HR with the recovered kernel must
    # reproduce the true LR far better than the bicubic assumption does
    def embed(k, size):
        p = size - k.shape[0]
        assert p >= 0 and p % 2 == 0, (k.shape, size)
        return np.pad(k, p // 2)

    size = max(k_true.shape[0], k_rec.shape[0])
    size += (size - k_true.shape[0]) % 2

    def action(k):
        ke = embed(k, size + (size - k.shape[0]) % 2) \
            if (size - k.shape[0]) % 2 else embed(k, size)
        return np.asarray(jax.lax.conv_general_dilated(
            hr, jnp.asarray(ke.astype(np.float32))[:, :, None, None],
            (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')))[..., 0]

    lr_t = action(k_true)
    lr_r = action(k_rec)
    m = min(lr_t.shape[1], lr_r.shape[1]) - 8
    a, b = lr_t[:, 4:m, 4:m], lr_r[:, 4:m, 4:m]
    mae_rec = np.abs(a - b).mean()
    from exsr.kernelgan.kernelgan import BICUBIC_K8
    bic = np.zeros((13, 13))
    bic[2:10, 2:10] = BICUBIC_K8  # COM at 6.5: matches the sf=2 convention
    lr_b = action(bic)
    mae_bic = np.abs(lr_t[:, 4:m, 4:m] - lr_b[:, 4:m, 4:m]).mean()
    assert mae_rec < 0.5 * mae_bic, (mae_rec, mae_bic)
    assert mae_rec < 0.02, mae_rec
