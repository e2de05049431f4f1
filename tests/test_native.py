"""Native C++ data-path kernels: parity with the numpy oracle."""
import numpy as np
import pytest

from exsr import native
from exsr.ops import resize as R


@pytest.mark.skipif(not native.available(), reason='no C++ toolchain')
def test_native_matches_numpy_imresize():
    rng = np.random.default_rng(0)
    hr = rng.uniform(size=(48, 56, 3))
    for sf in (2, 4):
        a = R.imresize(hr, 1.0 / sf, allow_native=True)
        b = R.imresize(hr, 1.0 / sf, allow_native=False)
        np.testing.assert_allclose(a, b, atol=1e-12)
        lr = rng.uniform(size=(12, 14, 3))
        a = R.imresize(lr, float(sf), allow_native=True)
        b = R.imresize(lr, float(sf), allow_native=False)
        np.testing.assert_allclose(a, b, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason='no C++ toolchain')
def test_native_grayscale_and_speed():
    import time
    rng = np.random.default_rng(1)
    hr = rng.uniform(size=(480, 480))
    a = R.imresize(hr, 0.25, allow_native=True)
    b = R.imresize(hr, 0.25, allow_native=False)
    np.testing.assert_allclose(a, b, atol=1e-12)
    t0 = time.perf_counter()
    for _ in range(5):
        R.imresize(hr, 0.25, allow_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        R.imresize(hr, 0.25, allow_native=False)
    t_numpy = time.perf_counter() - t0
    print(f'native {t_native*200:.1f} ms vs scipy {t_numpy*200:.1f} ms')
    assert t_native < t_numpy  # the point of the native path
