"""Golden tests for the L0 resize-kernel layer against the reference math.

The reference derives its bicubic kernel by cv2-resizing a delta image
(imresize_CEM.py:104-115); we derive it analytically.  These tests pin the
two to each other and check the stride/padding conventions and kernel
invariants that the CEM's consistency guarantee depends on.
"""
import numpy as np
import pytest

from exsr.ops import resize as R


@pytest.mark.parametrize('sf', [2, 3, 4])
def test_bicubic_kernel_matches_cv2_delta_probe(sf):
    cv2 = pytest.importorskip('cv2')
    delta = np.zeros((11, 11))
    delta[5, 5] = 1.0
    up = cv2.resize(delta, dsize=(sf * 11, sf * 11),
                    interpolation=cv2.INTER_CUBIC)
    row = sf * int(np.ceil(11 / 2)) - 1
    support = np.nonzero(up[row, :])[0]
    golden = up[support[0]:support[-1] + 1, support[0]:support[-1] + 1]
    ours = R.bicubic_upscale_kernel_2d(sf)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=1e-7)


@pytest.mark.parametrize('sf', [2, 3, 4, 8])
def test_kernel_invariants(sf):
    k = R.padded_upscale_kernel(sf)
    # partition of unity: the upscale kernel sums to sf^2 (within the
    # float32 coefficient precision inherited from the cv2-parity synthesis)
    assert abs(k.sum() - sf ** 2) < 2e-5 * sf ** 2
    # even factors gain one zero pre-row/col (4*sf support + 1);
    # odd factors stay at their 4*sf-1 support
    expected = 4 * sf + 1 if sf % 2 == 0 else 4 * sf - 1
    assert k.shape == (expected, expected)
    h = R.downscale_kernel(sf)
    assert abs(h.sum() - 1.0) < 2e-5


def test_calc_strides_conventions():
    # factor 4, no align: post = floor(4/2) = 2, pre = 4-2-1 = 1
    pre, post = R.calc_strides((0, 0), 4)
    assert tuple(pre) == (1, 1) and tuple(post) == (2, 2)
    pre, post = R.calc_strides((0, 0), 2)
    assert tuple(pre) == (0, 0) and tuple(post) == (1, 1)
    pre, post = R.calc_strides((0, 0), 3)
    assert tuple(pre) == (1, 1) and tuple(post) == (1, 1)
    # align_center on a 33x33 array with factor 1/4 (inv_hTh construction):
    pre, post = R.calc_strides((33, 33), 1 / 4, align_center=True)
    assert tuple(pre) == (0, 0) and tuple(post) == (3, 3)


@pytest.mark.parametrize('sf', [2, 4])
def test_imresize_constant_preserved_in_interior(sf):
    im = 0.5 * np.ones((16, 16, 3))
    up = R.imresize(im, sf)
    assert up.shape == (16 * sf, 16 * sf, 3)
    m = 4 * sf  # border region affected by edge-padding the stuffed image
    np.testing.assert_allclose(up[m:-m, m:-m], 0.5, atol=1e-5)
    down = R.imresize(up[: 8 * sf, : 8 * sf], 1.0 / sf)
    np.testing.assert_allclose(down[4:-4, 4:-4], 0.5, atol=1e-5)


def test_imresize_matches_reference_goldens():
    """Bit-parity with the reference imresize (imresize_CEM.py:8-87) on
    checked-in golden arrays (exact equality was verified at generation)."""
    g = np.load('tests/golden/reference_cem.npz')
    lr, hr = g['lr_input'], g['hr_input']
    for sf in (2, 3, 4):
        np.testing.assert_array_almost_equal(
            R.imresize(lr, sf), g[f'up{sf}'], decimal=12)
    np.testing.assert_array_almost_equal(
        R.imresize(hr, 1 / 2), g['down2'], decimal=12)
    np.testing.assert_array_almost_equal(
        R.imresize(hr, 1 / 4), g['down4'], decimal=12)


def test_downscale_upscale_is_hth():
    """down(up(x)) is NOT identity — it is the aliased h*rot180(h) filter
    (this is exactly why the CEM needs inv_hTh; see
    exsr.ops.inv_hth.compute_inv_hth).  Verify against direct filtering."""
    from scipy.signal import convolve2d
    from exsr.ops.resize import aliased_downsample
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(20, 20))
    hr = R.imresize(lr, 4, use_zero_padding=True)
    back = R.imresize(hr, 1 / 4, use_zero_padding=True)
    h = R.downscale_kernel(4)
    hth = aliased_downsample(convolve2d(h, np.rot90(h, 2)) * 16, 4)
    direct = convolve2d(lr, hth, 'same')
    np.testing.assert_allclose(back[6:-6, 6:-6], direct[6:-6, 6:-6],
                               atol=1e-6)


def test_center_mass_identity_for_symmetric_kernel():
    # a symmetric gaussian is already centered: recentering must keep the sum
    # at 1 and the kernel square
    g = R.gaussian_2d(1.5, size=13)
    out = R.center_mass(g, ds_factor=4)
    assert out.shape[0] == out.shape[1]
    assert abs(out.sum() - 1.0) < 1e-9
    # size satisfies the (size-1+(f+1)%2) % f == 0 constraint
    assert (out.shape[0] - 1 + (4 + 1) % 2) % 4 == 0


def test_registry_estimated_kernel():
    reg = R.KernelRegistry()
    g = R.gaussian_2d(1.2, size=13)
    reg.set_estimated(4, g)
    h = R.downscale_kernel(4, reg)
    assert abs(h.sum() - 1.0) < 1e-9
