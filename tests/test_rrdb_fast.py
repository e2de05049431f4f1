"""Grouped fast-inference path equivalence vs the canonical RRDBNet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.models.rrdb import RRDBNet
from exsr.models.rrdb_fast import pack_grouped_params, rrdbnet_apply_fast


@pytest.mark.parametrize('latent', [3, 0])
def test_fast_path_matches_flax(latent):
    nf, gc, nb = 16, 8, 2
    g = RRDBNet(nf=nf, gc=gc, nb=nb, latent_channels=latent)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (2, 12, 12, 3))
    z = (jax.random.uniform(jax.random.PRNGKey(2), (2, 48, 48, latent))
         * 2 - 1 if latent else None)
    params = g.init(jax.random.PRNGKey(0), lr, z)
    ref = np.asarray(g.apply(params, lr, z))
    out = np.asarray(rrdbnet_apply_fast(
        params, lr, z, nf=nf, gc=gc, nb=nb, latent_channels=latent,
        dtype=None))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pack_grouped_shapes():
    nf, gc, nb, nz = 16, 8, 2, 3
    g = RRDBNet(nf=nf, gc=gc, nb=nb, latent_channels=nz)
    lr = jnp.zeros((1, 8, 8, 3))
    z = jnp.zeros((1, 32, 32, nz))
    params = g.init(jax.random.PRNGKey(0), lr, z)
    packed, rest = pack_grouped_params(params, nf=nf, gc=gc,
                                       latent_channels=nz)
    e = packed['rdb1']
    assert e['w0'].shape == (nb, 3, 3, nz + nf, 4 * gc + nf)
    assert e['w1'].shape == (nb, 3, 3, gc, 3 * gc + nf)
    assert e['w4'].shape == (nb, 3, 3, gc, nf)
    assert set(rest) >= {'fea_conv', 'trunk_conv', 'upconv0', 'upconv1',
                         'hr_conv0', 'hr_conv1'}


def test_subpixel_upconv_matches_nearest_then_conv():
    """fold_upconv_kernel/subpixel_upconv == conv3x3(nearest_upsample(x,2))
    exactly, including zero borders (block.py:293-309 semantics)."""
    from exsr.models.rrdb_fast import fold_upconv_kernel, subpixel_upconv
    from exsr.ops.filters import nearest_upsample
    rng = np.random.default_rng(0)
    for (h, w, ci, co) in [(7, 9, 5, 4), (1, 1, 3, 2), (8, 3, 16, 8)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype('f'))
        k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype('f'))
        b = jnp.asarray(rng.normal(size=(co,)).astype('f'))
        ref = jax.lax.conv_general_dilated(
            nearest_upsample(x, 2), k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
        out = subpixel_upconv(x, fold_upconv_kernel(k), b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.parametrize('chunk', [1, 2])
def test_tail_chunked_matches_unchunked(chunk):
    """Batch-chunked HR tail (the large-batch HBM relief) is bit-identical
    to the unchunked forward — per-image computation is independent."""
    nf, gc, nb, nz = 16, 8, 2, 3
    g = RRDBNet(nf=nf, gc=gc, nb=nb, latent_channels=nz)
    lr = jax.random.uniform(jax.random.PRNGKey(3), (4, 12, 12, 3))
    z = jax.random.uniform(jax.random.PRNGKey(4), (4, 48, 48, nz)) * 2 - 1
    params = g.init(jax.random.PRNGKey(0), lr, z)
    packed = pack_grouped_params(params, nf=nf, gc=gc, latent_channels=nz)
    ref = np.asarray(rrdbnet_apply_fast(params, lr, z, nf=nf, gc=gc,
                                        nb=nb, latent_channels=nz,
                                        dtype=None, packed=packed))
    out = np.asarray(rrdbnet_apply_fast(params, lr, z, nf=nf, gc=gc,
                                        nb=nb, latent_channels=nz,
                                        dtype=None, packed=packed,
                                        tail_chunk=chunk))
    np.testing.assert_array_equal(out, ref)


def test_trunk_tail_split_composes():
    from exsr.models.rrdb_fast import rrdb_trunk_fast, rrdb_tail_fast
    nf, gc, nb, nz = 16, 8, 2, 3
    g = RRDBNet(nf=nf, gc=gc, nb=nb, latent_channels=nz)
    lr = jax.random.uniform(jax.random.PRNGKey(5), (2, 12, 12, 3))
    z = jax.random.uniform(jax.random.PRNGKey(6), (2, 48, 48, nz)) * 2 - 1
    params = g.init(jax.random.PRNGKey(0), lr, z)
    packed = pack_grouped_params(params, nf=nf, gc=gc, latent_channels=nz)
    feats = rrdb_trunk_fast(packed, lr, z, nf=nf, gc=gc, dtype=None)
    assert feats.shape == (2, 12, 12, nf)
    out = rrdb_tail_fast(packed, feats, z, upscale=4)
    ref = np.asarray(rrdbnet_apply_fast(params, lr, z, nf=nf, gc=gc,
                                        nb=nb, latent_channels=nz,
                                        dtype=None, packed=packed))
    np.testing.assert_array_equal(np.asarray(out), ref)
