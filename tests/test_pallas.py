"""Pallas kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from exsr.ops.pallas.sepfilter import sepfilter_edge_pallas
from exsr.ops import filters as F


def test_sepfilter_matches_lax_path():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 24, 24, 3)).astype(np.float32))
    kcol = tuple(np.array([0.1, 0.2, 0.4, 0.2, 0.1]))
    krow = tuple(np.array([0.25, 0.5, 0.25]))
    ref = F.filter_replicate_same_separable(
        x, F.depthwise_weights_1d(np.array(kcol), 3, 0),
        F.depthwise_weights_1d(np.array(krow), 3, 1))
    out = sepfilter_edge_pallas(x, kcol, krow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sepfilter_inv_hth_taps():
    """Real CEM inv_hTh taps through the pallas kernel (interpret)."""
    from exsr.cem.cem import CEM, CEMConf
    cem = CEM.create(CEMConf(scale_factor=4))
    fac = F.separable_factors(cem.inv_hth)
    assert fac is not None
    col, row = fac
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    ref = F.filter_replicate_same(x, F.depthwise_weights(cem.inv_hth, 3))
    out = sepfilter_edge_pallas(x, tuple(col.tolist()),
                                tuple(row.tolist()), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
