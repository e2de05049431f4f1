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


def test_stage4_pallas_matches_reference():
    """stage4_pallas == the _rdb_grouped stage-4 tail (interpret mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from exsr.ops.pallas.stage4 import stage4_pallas
    rng = np.random.default_rng(0)
    b, h, w, gc, nf = 2, 12, 12, 8, 16
    c3 = jnp.asarray(rng.normal(size=(b, h, w, gc)).astype('f'))
    ps = [jnp.asarray(rng.normal(size=(b, h, w, nf + k * gc)).astype('f'))
          for k in (4, 3, 2, 1)]
    x = jnp.asarray(rng.normal(size=(b, h, w, nf)).astype('f'))
    w4 = jnp.asarray(rng.normal(size=(3, 3, gc, nf)).astype('f') * 0.1)
    b4 = jnp.asarray(rng.normal(size=(nf,)).astype('f'))

    conv = jax.lax.conv_general_dilated(
        c3, w4, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ref = (conv + b4 + sum(p[..., :nf] for p in ps)) * 0.2 + x
    out = stage4_pallas(c3, *ps, x, w4, b4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


@pytest.mark.parametrize('h,rc', [(24, 8), (20, 8), (12, 32)])
def test_stage4_pallas_chunked_matches_reference(h, rc):
    """Row-chunked stage4 kernel == direct conv reference (interpret).

    Covers: multi-chunk (24/8), non-divisible target falling back to a
    divisor (20 -> r=5 via _pick_row_chunk), single-chunk (12 < 32)."""
    import jax
    from exsr.ops.pallas.stage4 import stage4_pallas_chunked
    rng = np.random.default_rng(0)
    b, w, gc, nf = 2, 12, 8, 16
    c3 = jnp.asarray(rng.normal(size=(b, h, w, gc)).astype('f'))
    ps = [jnp.asarray(rng.normal(size=(b, h, w, nf + k * gc)).astype('f'))
          for k in (4, 3, 2, 1)]
    x = jnp.asarray(rng.normal(size=(b, h, w, nf)).astype('f'))
    w4 = jnp.asarray(rng.normal(size=(3, 3, gc, nf)).astype('f') * 0.1)
    b4 = jnp.asarray(rng.normal(size=(nf,)).astype('f'))

    conv = jax.lax.conv_general_dilated(
        c3, w4, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ref = (conv + b4 + sum(p[..., :nf] for p in ps)) * 0.2 + x
    out = stage4_pallas_chunked(c3, *ps, x, w4, b4, row_chunk=rc,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_rdb_grouped_with_stage4_kernel_matches():
    """_rdb_grouped(stage4=pallas interpret) == plain _rdb_grouped."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import pack_grouped_params, _rdb_grouped
    from exsr.ops.pallas.stage4 import stage4_pallas
    nf, gc, nb, nz = 16, 8, 1, 3
    g = RRDBNet(nf=nf, gc=gc, nb=nb, latent_channels=nz)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (2, 12, 12, 3))
    z = jax.random.uniform(jax.random.PRNGKey(2), (2, 48, 48, nz))
    params = g.init(jax.random.PRNGKey(0), lr, z)
    packed, _ = pack_grouped_params(params, nf=nf, gc=gc,
                                    latent_channels=nz)
    e = {k: v[0] for k, v in packed['rdb1'].items()}  # strip [nb] axis
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, nf))
    zl = jax.random.normal(jax.random.PRNGKey(4), (2, 12, 12, nz))
    ref = _rdb_grouped(x, zl, e, nf, gc)
    out = _rdb_grouped(x, zl, e, nf, gc,
                       stage4=lambda *a: stage4_pallas(*a, interpret=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_trunk_fast_stage4_pallas_chunked_branch():
    """rrdb_trunk_fast(stage4_pallas=True) at h>32 routes through the
    row-chunked kernel and matches the plain grouped trunk (interpret)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import pack_grouped_params, rrdb_trunk_fast
    nf, gc, nb, nz = 16, 8, 1, 3
    g = RRDBNet(nf=nf, gc=gc, nb=nb, latent_channels=nz)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 36, 3))
    z = jax.random.uniform(jax.random.PRNGKey(2), (1, 160, 144, nz))
    params = g.init(jax.random.PRNGKey(0), lr, z)
    packed = pack_grouped_params(params, nf=nf, gc=gc, latent_channels=nz)
    ref = rrdb_trunk_fast(packed, lr, z, nf=nf, gc=gc, dtype=None)
    with pltpu.force_tpu_interpret_mode():
        out = rrdb_trunk_fast(packed, lr, z, nf=nf, gc=gc, dtype=None,
                              stage4_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
