"""Model-layer tests: shapes, parameter parity, Z-sensitivity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.models.rrdb import RRDBNet
from exsr.models.discriminators import (DiscriminatorVGG128,
                                        PatchGANDiscriminator)
from exsr.models.dncnn import DnCNN, DnCNNConfig, DnCNNDiscriminator
from exsr.models.vgg import VGG19Features


def test_rrdb_param_count_matches_reference():
    """Parameter count of the full 23-block explorable generator equals the
    reference RRDBNet with 3 latent channels (architecture.py:228-302,
    analytically: 17,060,948)."""
    m = RRDBNet(nb=23, latent_channels=3)
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n == 17_060_948


def test_rrdb_forward_and_z_sensitivity():
    m = RRDBNet(nb=2, latent_channels=3)
    key = jax.random.PRNGKey(0)
    lr = jax.random.uniform(key, (2, 12, 12, 3))
    z0 = jnp.zeros((2, 48, 48, 3))
    z1 = jnp.ones((2, 48, 48, 3))
    params = m.init(key, lr, z0)
    out0 = m.apply(params, lr, z0)
    out1 = m.apply(params, lr, z1)
    assert out0.shape == (2, 48, 48, 3)
    # Z must actually modulate the output
    assert float(jnp.abs(out0 - out1).max()) > 1e-6


@pytest.mark.slow
def test_rrdb_no_latent():
    m = RRDBNet(nb=2, latent_channels=0)
    lr = jnp.zeros((1, 10, 10, 3))
    params = m.init(jax.random.PRNGKey(0), lr, None)
    assert m.apply(params, lr, None).shape == (1, 40, 40, 3)


@pytest.mark.slow
def test_discriminator_vgg128_fc_head():
    d = DiscriminatorVGG128(nb=10, num_2_strides=5, input_patch_size=128)
    x = jnp.zeros((2, 128, 128, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    out, _ = d.apply(variables, x, train=True,
                     mutable=['batch_stats'])
    assert out.shape == (2, 1)


def test_discriminator_vgg128_patch_head():
    d = DiscriminatorVGG128(nb=6, num_2_strides=3, input_patch_size=64)
    x = jnp.zeros((1, 64, 64, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    out, _ = d.apply(variables, x, train=True, mutable=['batch_stats'])
    assert out.ndim == 4 and out.shape[-1] == 1


def test_discriminator_vgg128_patch_head_logit_is_norm_free():
    """Regression for the 50k-run root cause: the final 1x1 logit conv of
    the patch head must carry NO BatchNorm (a batch-stat norm on the
    logit pins the batch mean, making real/fake means structurally
    inseparable under any GAN loss — scripts_dev/probe_d_learn.py). The
    reference builds pseudo_FC_conv1 WITH norm_type (architecture.py:501)
    but never exercises it (its configs use num_2_strides=5 -> FC head);
    this is a documented deliberate deviation (discriminators.py)."""
    d = DiscriminatorVGG128(nb=6, num_2_strides=3, input_patch_size=64)
    variables = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert 'pseudo_fc1' in variables['params']
    assert 'bn' not in variables['params']['pseudo_fc1']
    assert not any(k.startswith('pseudo_fc1')
                   for k in variables.get('batch_stats', {}))


def test_patchgan_decomposed():
    d = PatchGANDiscriminator(n_layers=3, decomposed_input=True,
                              pre_clipping=True)
    lo = jnp.zeros((1, 64, 64, 3))
    hi = jnp.zeros((1, 64, 64, 3))
    variables = d.init(jax.random.PRNGKey(0), (lo, hi))
    out = d.apply(variables, (lo, hi))
    assert out.shape[0] == 1 and out.shape[-1] == 1


def test_dncnn_generator_residual_head():
    cfg = DnCNNConfig(n_channels=32, depth=4, num_latent_channels=64)
    g = DnCNN(cfg)
    coeffs = jnp.zeros((1, 8, 8, 64))
    z = jnp.zeros((1, 8, 8, 64))
    variables = g.init(jax.random.PRNGKey(0), coeffs, z)
    out, _ = g.apply(variables, coeffs, z, train=True,
                     mutable=['batch_stats'])
    assert out.shape == coeffs.shape
    # residual head: output stays within +-0.5 of the quantized coefficients
    assert float(jnp.abs(out - coeffs).max()) <= 0.5


def test_dncnn_discriminator_shapes():
    d = DnCNNDiscriminator(n_channels=32, depth=4, expected_input_size=16,
                           norm='layer', spectral_norm=False)
    x = jnp.zeros((2, 16, 16, 64))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (2, 1)


@pytest.mark.slow
def test_vgg19_features_shapes():
    m = VGG19Features()
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # conv5_4: 4 maxpools before block5 -> 64/16 = 4, 512 channels
    assert out.shape == (1, 4, 4, 512)


@pytest.mark.slow
def test_vgg96_and_acd_heads():
    from exsr.models.discriminators import DiscriminatorVGG, ACDVGGBN96
    x = jnp.zeros((1, 96, 96, 3))
    d = DiscriminatorVGG(base_nf=16, input_size=96)
    v = d.init(jax.random.PRNGKey(0), x)
    out, _ = d.apply(v, x, train=True, mutable=['batch_stats'])
    assert out.shape == (1, 1)
    acd = ACDVGGBN96(base_nf=16, num_classes=8)
    v = acd.init(jax.random.PRNGKey(0), x)
    (gan, cls), _ = acd.apply(v, x, train=True, mutable=['batch_stats'])
    assert gan.shape == (1, 1) and cls.shape == (1, 8)


@pytest.mark.slow
def test_vgg128_sn():
    from exsr.models.discriminators import DiscriminatorVGG128SN
    x = jnp.zeros((1, 128, 128, 3))
    d = DiscriminatorVGG128SN(nf=8)
    v = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(v, x, mutable=['spectral'])[0]
    assert out.shape == (1, 1)


@pytest.mark.slow
def test_msrresnet_and_srresnet():
    from exsr.models.classifiers import MSRResNet, SRResNet
    x = jnp.zeros((1, 12, 12, 3))
    for cls in (MSRResNet, SRResNet):
        m = cls(nb=2, nf=8)
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == (1, 48, 48, 3)


@pytest.mark.slow
def test_svhn_classifier_heads():
    from exsr.models.classifiers import SVHNClassifier
    m = SVHNClassifier()
    x = jnp.zeros((2, 54, 54, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    heads = m.apply(v, x)
    assert heads[0].shape == (2, 7)
    assert all(h.shape == (2, 11) for h in heads[1:])


@pytest.mark.slow
def test_esrgan_converter_zero_z_equivalence():
    """Converted ESRGAN weights with zero-init Z columns: at Z=0 the
    explorable generator must equal the latent-free generator with the
    same image weights (warm-start migration, base_model.py:146-190)."""
    from exsr.models.convert import convert_esrgan_rrdb, align_params_to
    nb, nf, gc = 2, 8, 4
    rng = np.random.default_rng(0)

    state = {}
    def add_conv(key, cin, cout, k=3):
        state[f'{key}.weight'] = rng.normal(
            0, 0.05, size=(cout, cin, k, k)).astype(np.float32)
        state[f'{key}.bias'] = rng.normal(
            0, 0.01, size=(cout,)).astype(np.float32)

    add_conv('model.0', 3, nf)
    for i in range(nb):
        for r in (1, 2, 3):
            for c in range(5):
                cin = nf + c * gc
                cout = gc if c < 4 else nf
                add_conv(f'model.1.sub.{i}.RDB{r}.conv{c + 1}.0', cin, cout)
    add_conv(f'model.1.sub.{nb}', nf, nf)
    add_conv('model.3', nf, nf)
    add_conv('model.6', nf, nf)
    add_conv('model.8', nf, nf)
    add_conv('model.10', nf, 3)

    lr = jnp.asarray(rng.uniform(size=(1, 10, 10, 3)).astype(np.float32))
    # latent-free model with nz=0 conversion
    g0 = RRDBNet(nb=nb, nf=nf, gc=gc, latent_channels=0)
    t0 = g0.init(jax.random.PRNGKey(0), lr, None)
    p0 = align_params_to(t0, convert_esrgan_rrdb(state, nb=nb,
                                                 latent_channels=0))
    out0 = g0.apply(p0, lr, None)
    # explorable model with zero-init Z at Z=0
    g3 = RRDBNet(nb=nb, nf=nf, gc=gc, latent_channels=3)
    z = jnp.zeros((1, 40, 40, 3))
    t3 = g3.init(jax.random.PRNGKey(0), lr, z)
    p3 = align_params_to(t3, convert_esrgan_rrdb(state, nb=nb,
                                                 latent_channels=3))
    out3 = g3.apply(p3, lr, z)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out0),
                               atol=1e-6)
    # nonzero Z changes nothing through ZERO Z-weights (they are zeros)
    out3b = g3.apply(p3, lr, jnp.ones_like(z))
    np.testing.assert_allclose(np.asarray(out3b), np.asarray(out0),
                               atol=1e-6)


def test_esrgan_converter_z_multiple_of_gc():
    """A trained explorable checkpoint whose nz is a multiple of 32 (so
    every z-carrying input width is ALSO a multiple of 32) must be
    recognized as already-z and not zero-padded a second time — the old
    `base_in % 32 != 0` heuristic misclassified exactly this case."""
    from exsr.models.convert import convert_esrgan_rrdb
    nb, nf, gc, nz = 1, 32, 32, 32
    rng = np.random.default_rng(1)

    state = {}
    def add_conv(key, cin, cout, k=3):
        state[f'{key}.weight'] = rng.normal(
            0, 0.05, size=(cout, cin, k, k)).astype(np.float32)
        state[f'{key}.bias'] = np.zeros((cout,), np.float32)

    add_conv('model.0', 3 + nz, nf)
    for r in (1, 2, 3):
        for c in range(5):
            cin = nf + c * gc + nz   # z channels already present
            cout = gc if c < 4 else nf
            add_conv(f'model.1.sub.0.RDB{r}.conv{c + 1}.0', cin, cout)
    add_conv(f'model.1.sub.{nb}', nf + nz, nf)
    add_conv('model.3', nf, nf)
    add_conv('model.6', nf, nf)
    add_conv('model.8', nf + nz, nf)
    add_conv('model.10', nf + nz, 3)

    params = convert_esrgan_rrdb(state, nb=nb, latent_channels=nz)['params']
    # no double-padding: input widths unchanged from the checkpoint
    # (in-channels is axis -2: HWIO, or [nb]+HWIO for stacked trunk convs)
    assert params['fea_conv']['kernel'].shape[-2] == 3 + nz
    assert params['trunk']['RRDB_0']['rdb1']['conv2']['Conv_0'][
        'kernel'].shape[-2] == nf + 2 * gc + nz
    assert params['hr_conv1']['Conv_0']['kernel'].shape[-2] == nf + nz
    # and an inconsistent width is a hard error, not a silent guess
    state['model.8.weight'] = rng.normal(
        0, 0.05, size=(nf, nf + 7, 3, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        convert_esrgan_rrdb(state, nb=nb, latent_channels=nz)


@pytest.mark.slow
def test_perceptual_nets_shapes():
    from exsr.models.perceptual import MINCNet, ResNet101Features
    x = jnp.zeros((1, 64, 64, 3))
    m = MINCNet()
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 4, 4, 512)
    r = ResNet101Features()
    v = r.init(jax.random.PRNGKey(0), x)
    out, _ = r.apply(v, x, train=False, mutable=['batch_stats'])
    assert out.shape == (1, 2, 2, 2048)


def test_segnet_encoder_and_autoencoder():
    import jax
    from exsr.models.encoders import SegNet, max_pool_argmax, max_unpool

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    # pool/unpool round trip: the max of each 2x2 cell returns to its
    # argmax position
    pooled, sel = max_pool_argmax(x)
    up = max_unpool(pooled, sel)
    assert up.shape == x.shape
    nz = np.asarray(up != 0)
    assert nz.sum() == pooled.size
    np.testing.assert_allclose(np.asarray(up).max(), np.asarray(x).max())

    enc = SegNet(encode_only=True, num_layers=4, batch_norm_ds=False)
    v = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(v, x)
    assert feats.shape == (1, 4, 4, 512)

    ae = SegNet(num_layers=5)
    v = ae.init(jax.random.PRNGKey(0), x)
    recon = ae.apply(v, x)
    assert recon.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_eresnet_encoder():
    import jax
    from exsr.models.encoders import EResNet

    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(size=(2, 128, 128, 3)).astype(np.float32))
    m = EResNet(output_nc=8)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8)

    mv = EResNet(output_nc=8, vae_like=True)
    v = mv.init(jax.random.PRNGKey(0), x)
    mu, logvar = mv.apply(v, x)
    assert mu.shape == logvar.shape == (2, 8)


def test_feature_extractor_factory():
    import jax
    from exsr.models.factory import make_feature_extractor

    x = jnp.asarray(np.random.default_rng(2)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    # (arch, expected shape, sign of min: conv cut keeps pre-ReLU negatives)
    cases = [('vgg19', (1, 4, 4, 512), True),
             ('vgg19_8', (1, 32, 32, 128), False),   # relu cut
             ('vgg19_9', (1, 16, 16, 128), False),   # pool cut
             ('SegNetAE', (1, 4, 4, 512), False)]
    for arch, shape, has_neg in cases:
        mod, apply = make_feature_extractor(arch)
        v = mod.init(jax.random.PRNGKey(0), x)
        f = apply(v, x)
        assert f.shape == shape, (arch, f.shape)
        assert (float(f.min()) < 0) == has_neg, arch
    with pytest.raises(ValueError):
        make_feature_extractor('alexnet')
