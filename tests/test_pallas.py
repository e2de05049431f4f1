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


@pytest.mark.slow
def test_rrdb_block_kernel_matches_flax():
    import jax
    from exsr.models.rrdb import RRDB
    from exsr.ops.pallas.rrdb_block import rrdb_block_pallas
    nf, gc, nz = 16, 8, 3
    blk = RRDB(nf=nf, gc=gc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, nf))
                    .astype(np.float32))
    z = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, nz))
                    .astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, z)
    ref = blk.apply(params, x, z)
    out = rrdb_block_pallas(x, z, params['params'], nf=nf, gc=gc,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_rrdbnet_pallas_trunk_matches_flax():
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from exsr.models.rrdb import RRDBNet
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.uniform(size=(1, 10, 10, 3)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-1, 1, size=(1, 40, 40, 3))
                    .astype(np.float32))
    g0 = RRDBNet(nb=2, nf=16, gc=8, latent_channels=3)
    p = g0.init(jax.random.PRNGKey(0), lr, z)
    ref = g0.apply(p, lr, z)
    g1 = RRDBNet(nb=2, nf=16, gc=8, latent_channels=3, pallas_trunk=True)
    with pltpu.force_tpu_interpret_mode():
        out = g1.apply(p, lr, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
