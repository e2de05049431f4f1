"""Converter parity: torch reference forwards vs converted flax forwards.

Each test builds the torch network with RANDOM weights (torch CPU is in the
image), converts the state dict through the shipped one-time tooling
(exsr/models/convert.py, vgg.py, classifiers.py), and asserts the flax
forward matches the torch forward — so 'weight conversion works' is a
tested claim, not an assumed one.

Torch architectures are re-declared here from their public definitions:
ESRGAN's classic RRDB layout (reference architecture.py:228-302 /
original xinntao ESRGAN), torchvision's vgg19 'features' layout
(architecture.py:658-724), and the SVHNClassifier-PyTorch model
(utils/SVHN_classifier_model.py).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ------------------------------------------------------------ torch ESRGAN
class _TorchRDB(nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        for i in range(5):
            cin = nf + i * gc
            cout = gc if i < 4 else nf
            setattr(self, f'conv{i + 1}',
                    nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1)))
        self.lrelu = nn.LeakyReLU(0.2)

    def forward(self, x):
        feats = [x]
        for i in range(4):
            out = getattr(self, f'conv{i + 1}')(torch.cat(feats, 1))
            feats.append(self.lrelu(out))
        out = self.conv5(torch.cat(feats, 1))
        return out * 0.2 + x


class _TorchRRDB(nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.RDB1 = _TorchRDB(nf, gc)
        self.RDB2 = _TorchRDB(nf, gc)
        self.RDB3 = _TorchRDB(nf, gc)

    def forward(self, x):
        return self.RDB3(self.RDB2(self.RDB1(x))) * 0.2 + x


class _Shortcut(nn.Module):
    def __init__(self, sub):
        super().__init__()
        self.sub = sub

    def forward(self, x):
        return x + self.sub(x)


def _torch_esrgan(nf, nb, gc):
    """Classic ESRGAN Sequential layout: model.0 / model.1.sub.N /
    model.3 / model.6 / model.8 / model.10."""
    up = nn.Upsample(scale_factor=2, mode='nearest')
    lrelu = nn.LeakyReLU(0.2)
    trunk = nn.Sequential(*[_TorchRRDB(nf, gc) for _ in range(nb)],
                          nn.Conv2d(nf, nf, 3, 1, 1))
    return nn.Sequential(
        nn.Conv2d(3, nf, 3, 1, 1), _Shortcut(trunk),
        up, nn.Conv2d(nf, nf, 3, 1, 1), lrelu,
        up, nn.Conv2d(nf, nf, 3, 1, 1), lrelu,
        nn.Conv2d(nf, nf, 3, 1, 1), lrelu,
        nn.Conv2d(nf, 3, 3, 1, 1))


def test_rrdb_converted_forward_matches_torch():
    from exsr.models.convert import convert_esrgan_rrdb, align_params_to
    from exsr.models.rrdb import RRDBNet

    nf, nb, gc = 16, 2, 8
    tg = _torch_esrgan(nf, nb, gc)
    torch.manual_seed(0)
    for p in tg.parameters():
        p.data.uniform_(-0.1, 0.1)
    tg.eval()
    state = {f'model.{k}': v for k, v in tg.state_dict().items()}

    g = RRDBNet(nf=nf, nb=nb, gc=gc, latent_channels=0)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 12, 12, 3)).astype(np.float32)
    template = g.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = align_params_to(
        template, convert_esrgan_rrdb(state, nb=nb, latent_channels=0))
    out_flax = np.asarray(g.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        out_torch = tg(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_torch = out_torch.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5)


def test_rrdb_latent_migration_matches_torch_at_zero_z():
    """Warm-start migration (base_model.py:146-190): converting the Z-less
    torch net into a latent_channels=3 flax net must reproduce the torch
    forward exactly at Z=0 (the zero-padded input columns see zeros)."""
    from exsr.models.convert import convert_esrgan_rrdb, align_params_to
    from exsr.models.rrdb import RRDBNet

    nf, nb, gc = 16, 2, 8
    tg = _torch_esrgan(nf, nb, gc)
    torch.manual_seed(1)
    for p in tg.parameters():
        p.data.uniform_(-0.1, 0.1)
    tg.eval()
    state = {f'model.{k}': v for k, v in tg.state_dict().items()}

    g = RRDBNet(nf=nf, nb=nb, gc=gc, latent_channels=3)
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 12, 12, 3)).astype(np.float32)
    z = jnp.zeros((1, 48, 48, 3), jnp.float32)
    template = g.init(jax.random.PRNGKey(0), jnp.asarray(x), z)
    params = align_params_to(
        template, convert_esrgan_rrdb(state, nb=nb, latent_channels=3))
    out_flax = np.asarray(g.apply(params, jnp.asarray(x), z))
    with torch.no_grad():
        out_torch = tg(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        out_flax, out_torch.numpy().transpose(0, 2, 3, 1), atol=2e-5)


# ------------------------------------------------------------- torch VGG19
def _torch_vgg19_features():
    from exsr.models.vgg import VGG19_CFG
    layers, cin = [], 3
    for item in VGG19_CFG:
        if item == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, item, 3, 1, 1), nn.ReLU()]
            cin = item
    return nn.Sequential(*layers)


@pytest.mark.slow
def test_vgg19_feature_extractor_matches_torch(tmp_path):
    """VGGFeatureExtractor parity (architecture.py:658-724): feature_layer
    34 == torchvision features[:35] == stop pre-ReLU after conv16, with
    ImageNet input normalization."""
    from exsr.models.vgg import (VGG19Features, load_torch_vgg19_features,
                                 IMAGENET_MEAN, IMAGENET_STD)

    feats = _torch_vgg19_features()
    torch.manual_seed(2)
    for p in feats.parameters():
        p.data.uniform_(-0.05, 0.05)
    feats.eval()
    path = str(tmp_path / 'vgg19.pth')
    torch.save({f'features.{k}': v for k, v in feats.state_dict().items()},
               path)

    variables = load_torch_vgg19_features(path, num_convs=16)
    model = VGG19Features(num_convs=16, use_input_norm=True)
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    out_flax = np.asarray(model.apply(variables, jnp.asarray(x)))

    xn = (x - IMAGENET_MEAN) / IMAGENET_STD
    with torch.no_grad():
        out_torch = feats[:35](torch.from_numpy(xn.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        out_flax, out_torch.numpy().transpose(0, 2, 3, 1), atol=5e-4)


# ---------------------------------------------------------- torch SVHN net
def _torch_svhn():
    feats = [3, 48, 64, 128, 160, 192, 192, 192, 192]
    mods = {}
    for i in range(8):
        mods[f'_hidden{i + 1}'] = nn.Sequential(
            nn.Conv2d(feats[i], feats[i + 1], 5, padding=2),
            nn.BatchNorm2d(feats[i + 1]),
            nn.ReLU(),
            nn.MaxPool2d(2, stride=2 if i % 2 == 0 else 1, padding=1),
            nn.Dropout(0.0))
    mods['_hidden9'] = nn.Sequential(nn.Linear(192 * 7 * 7, 3072),
                                     nn.ReLU())
    mods['_hidden10'] = nn.Sequential(nn.Linear(3072, 3072), nn.ReLU())
    mods['_digit_length'] = nn.Sequential(nn.Linear(3072, 7))
    for d in range(1, 6):
        mods[f'_digit{d}'] = nn.Sequential(nn.Linear(3072, 11))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            for k, v in mods.items():
                setattr(self, k, v)

        def forward(self, x):
            for i in range(8):
                x = getattr(self, f'_hidden{i + 1}')(x)
            x = x.reshape(x.shape[0], -1)
            x = self._hidden10(self._hidden9(x))
            return tuple([self._digit_length(x)]
                         + [getattr(self, f'_digit{d}')(x)
                            for d in range(1, 6)])
    return M()


@pytest.mark.slow
def test_svhn_classifier_matches_torch(tmp_path):
    from exsr.models.classifiers import (SVHNClassifier,
                                         load_svhn_torch_state_dict)
    m = _torch_svhn()
    torch.manual_seed(3)
    for p in m.parameters():
        p.data.uniform_(-0.05, 0.05)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.1, 0.1)
            mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    path = str(tmp_path / 'svhn.pth')
    torch.save(m.state_dict(), path)

    variables = load_svhn_torch_state_dict(path)
    clf = SVHNClassifier()
    rng = np.random.default_rng(3)
    x = (rng.uniform(size=(2, 54, 54, 3)) * 2 - 1).astype(np.float32)
    heads_flax = clf.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        heads_torch = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(heads_flax) == len(heads_torch) == 6
    for hf, ht in zip(heads_flax, heads_torch):
        np.testing.assert_allclose(np.asarray(hf), ht.numpy(), atol=2e-4)


def test_explorable_checkpoint_roundtrip_and_cli(tmp_path):
    """A TRAINED explorable checkpoint (convs already include the 3 latent
    input channels) converts without zero-padding, and the
    `scripts convert_torch_g` CLI produces an orbax checkpoint that
    restores to the identical forward (the reference user's migration
    path; base_model.py:128-190)."""
    from exsr.models.convert import convert_esrgan_rrdb, align_params_to
    from exsr.models.rrdb import RRDBNet

    nf, nb, gc, nz = 16, 2, 8, 3
    g = RRDBNet(nf=nf, nb=nb, gc=gc, latent_channels=nz)
    rng = np.random.default_rng(3)
    lr = rng.uniform(size=(1, 12, 12, 3)).astype(np.float32)
    z = (rng.uniform(size=(1, 48, 48, nz)).astype(np.float32) * 2 - 1)
    params = g.init(jax.random.PRNGKey(5), jnp.asarray(lr), jnp.asarray(z))
    ref_out = np.asarray(g.apply(params, jnp.asarray(lr), jnp.asarray(z)))

    # export flax params -> torch-style explorable state dict (z channels
    # KEPT, hwio -> oihw)
    p = params['params']

    def put(state, key, entry):
        state[f'{key}.weight'] = torch.from_numpy(
            np.asarray(entry['kernel']).transpose(3, 2, 0, 1).copy())
        state[f'{key}.bias'] = torch.from_numpy(
            np.asarray(entry['bias']).copy())

    state = {}
    put(state, 'model.0', p['fea_conv'])
    for i in range(nb):
        for r in (1, 2, 3):
            for c in range(5):
                stacked = p['trunk']['RRDB_0'][f'rdb{r}'][f'conv{c}'][
                    'Conv_0']
                put(state, f'model.1.sub.{i}.RDB{r}.conv{c + 1}.0',
                    {k: v[i] for k, v in stacked.items()})
    put(state, f'model.1.sub.{nb}', p['trunk_conv']['Conv_0'])
    put(state, 'model.3', p['upconv0'])
    put(state, 'model.6', p['upconv1'])
    put(state, 'model.8', p['hr_conv0']['Conv_0'])
    put(state, 'model.10', p['hr_conv1']['Conv_0'])

    converted = align_params_to(
        params, convert_esrgan_rrdb(state, nb=nb, latent_channels=nz))
    out = np.asarray(g.apply(converted, jnp.asarray(lr), jnp.asarray(z)))
    np.testing.assert_allclose(out, ref_out, atol=1e-6)

    # CLI end-to-end: .pth -> orbax -> restore -> same forward
    pth = str(tmp_path / 'g.pth')
    torch.save(state, pth)
    out_dir = str(tmp_path / 'ckpt')
    from exsr.apps.scripts import convert_torch_g
    from exsr.train.checkpoints import CheckpointManager
    convert_torch_g(pth, out_dir, nb=nb, latent_channels=nz, scale=4,
                    nf=nf, gc=gc)
    restored = CheckpointManager(out_dir).restore({'g_params': params})
    out2 = np.asarray(g.apply(restored['g_params'], jnp.asarray(lr),
                              jnp.asarray(z)))
    np.testing.assert_allclose(out2, ref_out, atol=1e-6)


# ---------------------------------------------- full-system CEM-wrapped SR
class _TorchZRDB(nn.Module):
    """Reference explorable RDB: latent z concatenated before EVERY conv,
    channel order cat([z, x, c0, ...]) (block.py:196-242)."""

    def __init__(self, nf, gc, nz):
        super().__init__()
        for i in range(5):
            cin = nz + nf + i * gc
            cout = gc if i < 4 else nf
            setattr(self, f'conv{i + 1}',
                    nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1)))
        self.lrelu = nn.LeakyReLU(0.2)

    def forward(self, x, z):
        feats = [x]
        for i in range(4):
            out = getattr(self, f'conv{i + 1}')(torch.cat([z] + feats, 1))
            feats.append(self.lrelu(out))
        out = self.conv5(torch.cat([z] + feats, 1))
        return out * 0.2 + x


class _TorchZRRDB(nn.Module):
    def __init__(self, nf, gc, nz):
        super().__init__()
        self.RDB1 = _TorchZRDB(nf, gc, nz)
        self.RDB2 = _TorchZRDB(nf, gc, nz)
        self.RDB3 = _TorchZRDB(nf, gc, nz)

    def forward(self, x, z):
        out = self.RDB3(self.RDB2(self.RDB1(x, z), z), z)
        return out * 0.2 + x


class _TorchExplorableRRDB(nn.Module):
    """The reference's trained explorable generator shape
    (architecture.py:228-302, latent_input='all_layers',
    latent_input_domain='HR_downscaled')."""

    def __init__(self, nf, nb, gc, nz):
        super().__init__()
        self.fea = nn.Conv2d(3 + nz, nf, 3, 1, 1)
        self.blocks = nn.ModuleList(
            [_TorchZRRDB(nf, gc, nz) for _ in range(nb)])
        self.trunk_conv = nn.Conv2d(nf + nz, nf, 3, 1, 1)
        self.up0 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.up1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.hr0 = nn.Conv2d(nf + nz, nf, 3, 1, 1)
        self.hr1 = nn.Conv2d(nf + nz, 3, 3, 1, 1)
        self.lrelu = nn.LeakyReLU(0.2)

    def forward(self, x, z_hr):
        import torch.nn.functional as TF
        z = TF.interpolate(z_hr, size=x.shape[2:], mode='bilinear',
                           align_corners=False)
        fea = self.fea(torch.cat([z, x], 1))
        t = fea
        for b in self.blocks:
            t = b(t, z)
        t = self.trunk_conv(torch.cat([z, t], 1))
        x = fea + t
        x = self.lrelu(self.up0(TF.interpolate(x, scale_factor=2,
                                               mode='nearest')))
        x = self.lrelu(self.up1(TF.interpolate(x, scale_factor=2,
                                               mode='nearest')))
        x = self.lrelu(self.hr0(torch.cat([z_hr, x], 1)))
        return self.hr1(torch.cat([z_hr, x], 1))

    def state_dict_esrgan_layout(self, nb):
        sd = {}

        def put(key, conv):
            sd[f'{key}.weight'] = conv.weight.detach()
            sd[f'{key}.bias'] = conv.bias.detach()
        put('model.0', self.fea)
        for i, blk in enumerate(self.blocks):
            for r in (1, 2, 3):
                rdb = getattr(blk, f'RDB{r}')
                for c in range(1, 6):
                    put(f'model.1.sub.{i}.RDB{r}.conv{c}.0',
                        getattr(rdb, f'conv{c}')[0])
        put(f'model.1.sub.{nb}', self.trunk_conv)
        put('model.3', self.up0)
        put('model.6', self.up1)
        put('model.8', self.hr0)
        put('model.10', self.hr1)
        return sd


def _torch_cem_forward(gen_out, lr, cem):
    """Independent torch CEM forward from the math (CEMnet.py:283-311):
    ortho(lr) + g - ortho(downscale(g)), all filters from exsr's own
    host-side kernel synthesis."""
    import torch.nn.functional as TF
    from exsr.ops.resize import calc_strides
    sf = int(cem.conf.scale_factor)
    pre, _ = calc_strides((0, 0), sf)
    pre = (int(pre[0]), int(pre[1]))

    def filt(x, k2d):
        k = torch.from_numpy(np.ascontiguousarray(k2d)).float()
        c = x.shape[1]
        w = k[None, None].repeat(c, 1, 1, 1)
        kh, kw = k2d.shape
        xp = TF.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2),
                    mode='replicate')
        return TF.conv2d(xp, w, groups=c)

    def down(x):
        y = filt(x, np.rot90(cem.ds_kernel, 2).copy())
        return y[:, :, pre[0]::sf, pre[1]::sf]

    def up(x):
        n, c, h, w = x.shape
        st = torch.zeros(n, c, h * sf, w * sf)
        st[:, :, pre[0]::sf, pre[1]::sf] = x
        return filt(st, cem.ds_kernel * sf ** 2)

    def ortho(y):
        return up(filt(y, cem.inv_hth))

    return ortho(lr) + gen_out - ortho(down(gen_out))


@pytest.mark.slow
def test_full_system_cem_wrapped_parity_nonzero_z():
    """Locks the whole L0-L3 stack, not just the trunk: a torch reference
    explorable generator + torch CEM forward (built independently from the
    published math) must match exsr's converted, CEM-wrapped forward at a
    shared NONZERO Z to <=1e-5 (CEMnet.py:283-311, networks.py:116-117)."""
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.convert import convert_esrgan_rrdb, align_params_to
    from exsr.models.rrdb import RRDBNet

    nf, nb, gc, nz, sf = 16, 2, 8, 3, 4
    tg = _TorchExplorableRRDB(nf, nb, gc, nz)
    torch.manual_seed(7)
    for p in tg.parameters():
        p.data.uniform_(-0.1, 0.1)
    tg.eval()

    rng = np.random.default_rng(7)
    lr = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    z = (rng.uniform(size=(1, 128, 128, nz)) * 2 - 1).astype(np.float32)

    # torch side: generator forward + independent CEM math
    cem = CEM.create(CEMConf(scale_factor=sf))
    with torch.no_grad():
        t_lr = torch.from_numpy(lr.transpose(0, 3, 1, 2))
        t_z = torch.from_numpy(z.transpose(0, 3, 1, 2))
        t_gen = tg(t_lr, t_z)
        t_out = _torch_cem_forward(t_gen, t_lr, cem)
    t_out = t_out.numpy().transpose(0, 2, 3, 1)

    # exsr side: convert the torch weights, wrap in the device CEM
    g = RRDBNet(nf=nf, nb=nb, gc=gc, latent_channels=nz)
    template = g.init(jax.random.PRNGKey(0), jnp.asarray(lr),
                      jnp.asarray(z))
    params = align_params_to(template, convert_esrgan_rrdb(
        tg.state_dict_esrgan_layout(nb), nb=nb, latent_channels=nz))
    filt = cem.device_filters(3)
    wrapped = cem_wrap(lambda p, x, zz: g.apply(p, x, zz), filt, upscale=sf)
    out = np.asarray(wrapped(params, jnp.asarray(lr), jnp.asarray(z),
                             cem.invalidity_margins_lr, pre_pad=False))

    # the generator trunks agree first (diagnoses converter vs CEM)
    gen_flax = np.asarray(g.apply(params, jnp.asarray(lr), jnp.asarray(z)))
    np.testing.assert_allclose(gen_flax,
                               t_gen.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5)
    # and the final CEM-wrapped SR output matches end-to-end
    np.testing.assert_allclose(out, t_out, atol=1e-5)

    # the torch twin really is consistency-enforcing (sanity of the twin)
    from exsr.cem.cem import consistent_downsample
    down = np.asarray(filt.downscale(jnp.asarray(t_out)))
    m = cem.invalidity_margins_lr
    assert np.abs(down - lr)[:, m:-m, m:-m, :].max() < 5e-5


# -------------------------------------------------- torch DnCNN (JPEG G)
class _TorchDnCNN(nn.Module):
    """Reference DnCNN generator semantics (architecture.py:109-215):
    conv0(bias)+ReLU, middle convs (no bias)+BN(eps 1e-4)+LeakyReLU(0.01),
    final conv (no bias)+Sigmoid; latent concatenated (z first) before
    every conv in 'all_layers' mode; returns coeffs + (sigmoid - 0.5)."""

    def __init__(self, nf, depth, in_nc, out_nc, nz):
        super().__init__()
        self.nz = nz
        convs = [nn.Conv2d(in_nc + nz, nf, 3, padding=1, bias=True)]
        self.bns = nn.ModuleList()
        for _ in range(depth - 2):
            convs.append(nn.Conv2d(nf + nz, nf, 3, padding=1, bias=False))
            self.bns.append(nn.BatchNorm2d(nf, eps=1e-4, momentum=0.95))
        convs.append(nn.Conv2d(nf + nz, out_nc, 3, padding=1, bias=False))
        self.convs = nn.ModuleList(convs)

    def forward(self, coeffs, z):
        x = coeffs
        for i, conv in enumerate(self.convs):
            x = conv(torch.cat([z, x], dim=1))
            if i == 0:
                x = torch.relu(x)
            elif i < len(self.convs) - 1:
                x = self.bns[i - 1](x)
                x = torch.nn.functional.leaky_relu(x, 0.01)
        return coeffs + torch.sigmoid(x) - 0.5


def test_dncnn_jpeg_generator_matches_torch():
    """JPEG-side L2 parity: the flax DnCNN generator == the reference
    DnCNN forward (random weights transplanted, eval-mode BN with random
    running stats, nonzero Z, all-layers latent)."""
    from exsr.models.dncnn import DnCNN, DnCNNConfig
    nf, depth, in_nc, out_nc, nz = 12, 4, 64, 64, 8
    tm = _TorchDnCNN(nf, depth, in_nc, out_nc, nz)
    with torch.no_grad():
        for bn in tm.bns:
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1, 0.2)
            bn.bias.normal_(0, 0.2)
    tm.eval()

    g = DnCNN(DnCNNConfig(n_channels=nf, depth=depth, in_nc=in_nc,
                          out_nc=out_nc, latent_input='all_layers',
                          num_latent_channels=nz, norm='batch'))
    rng = np.random.default_rng(0)
    coeffs = rng.normal(size=(2, 6, 6, in_nc)).astype(np.float32)
    z = rng.normal(size=(2, 6, 6, nz)).astype(np.float32)
    variables = g.init(jax.random.PRNGKey(0), jnp.asarray(coeffs),
                       jnp.asarray(z), train=False)

    # transplant torch weights into the flax pytree (OIHW -> HWIO)
    params = jax.tree.map(lambda x: x, variables['params'])
    stats = jax.tree.map(lambda x: x, variables.get('batch_stats', {}))
    for i, conv in enumerate(tm.convs):
        w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[f'conv{i}']['kernel'] = jnp.asarray(w)
        if conv.bias is not None:
            params[f'conv{i}']['bias'] = jnp.asarray(
                conv.bias.detach().numpy())
    for j, bn in enumerate(tm.bns):
        params[f'BatchNorm_{j}']['scale'] = jnp.asarray(
            bn.weight.detach().numpy())
        params[f'BatchNorm_{j}']['bias'] = jnp.asarray(
            bn.bias.detach().numpy())
        stats[f'BatchNorm_{j}']['mean'] = jnp.asarray(
            bn.running_mean.detach().numpy())
        stats[f'BatchNorm_{j}']['var'] = jnp.asarray(
            bn.running_var.detach().numpy())

    with torch.no_grad():
        ref = tm(torch.from_numpy(coeffs.transpose(0, 3, 1, 2)),
                 torch.from_numpy(z.transpose(0, 3, 1, 2)))
    out = g.apply({'params': params, 'batch_stats': stats},
                  jnp.asarray(coeffs), jnp.asarray(z), train=False)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=2e-5)


# --------------------------------------------------------- torch MSRResNet
class _TorchResBlockNoBN(nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv2 = nn.Conv2d(nf, nf, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(torch.relu(self.conv1(x)))


class _TorchMSRResNet(nn.Module):
    """architecture.py:18-66 (random weights)."""

    def __init__(self, nf=16, nb=3, upscale=4):
        super().__init__()
        self.upscale = upscale
        self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
        self.recon_trunk = nn.Sequential(
            *[_TorchResBlockNoBN(nf) for _ in range(nb)])
        self.upconv1 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        self.upconv2 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        self.pixel_shuffle = nn.PixelShuffle(2)
        self.HRconv = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = nn.Conv2d(nf, 3, 3, 1, 1)
        self.lrelu = nn.LeakyReLU(0.1)

    def forward(self, x):
        fea = self.lrelu(self.conv_first(x))
        out = self.recon_trunk(fea)
        out = self.lrelu(self.pixel_shuffle(self.upconv1(out)))
        out = self.lrelu(self.pixel_shuffle(self.upconv2(out)))
        out = self.conv_last(self.lrelu(self.HRconv(out)))
        base = torch.nn.functional.interpolate(
            x, scale_factor=self.upscale, mode='bilinear',
            align_corners=False)
        return out + base


def test_msrresnet_converter_parity():
    """convert_msrresnet maps the torch MSRResNet (recon_trunk.i.conv1/2,
    PixelShuffle channel grouping) onto the flax module exactly —
    the train_srgan.json generator family (architecture.py:18-66)."""
    from exsr.models.classifiers import MSRResNet
    from exsr.models.convert import convert_msrresnet
    torch.manual_seed(0)
    tm = _TorchMSRResNet(nf=16, nb=3, upscale=4).eval()
    # recon_trunk keys come out as 'recon_trunk.0.conv1.weight' etc.
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          convert_msrresnet(state, nf=16, nb=3, upscale=4))
    fm = MSRResNet(nf=16, nb=3, upscale=4)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 12, 10, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    out = np.asarray(fm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


# ------------------------------------------- official-weights parity recipe
@pytest.mark.slow
def test_official_parity_recipe_flagship_shape(tmp_path):
    """VERDICT-r3 next #8: the one-command path from the paper's released
    pretrained explorable G (codes/README.md:40-43) to its eval table —
    `scripts official_parity` = convert_torch_g + eval_sr at Z=0 —
    validated end-to-end on a synthetic .pth with the EXACT flagship
    shape (nb=23, nf=64, gc=32, nz=3: the 17,060,948-param layout), so
    real-weights parity is one command the day weights are available."""
    import os
    from PIL import Image

    nb, nf, gc, nz = 23, 64, 32, 3
    rng = np.random.default_rng(0)

    def w(cin, cout):
        return torch.from_numpy(
            (rng.standard_normal((cout, cin, 3, 3)) * 0.03)
            .astype(np.float32))

    def put(state, key, cin, cout):
        state[f'{key}.weight'] = w(cin, cout)
        state[f'{key}.bias'] = torch.from_numpy(
            np.zeros(cout, np.float32))

    state = {}
    put(state, 'model.0', nz + 3, nf)
    for i in range(nb):
        for r in (1, 2, 3):
            for c in range(5):
                cin = nz + nf + c * gc
                cout = gc if c < 4 else nf
                put(state, f'model.1.sub.{i}.RDB{r}.conv{c + 1}.0',
                    cin, cout)
    put(state, f'model.1.sub.{nb}', nz + nf, nf)
    put(state, 'model.3', nf, nf)
    put(state, 'model.6', nf, nf)
    put(state, 'model.8', nz + nf, nf)
    put(state, 'model.10', nz + nf, 3)
    pth = str(tmp_path / 'flagship.pth')
    torch.save(state, pth)
    n_params = sum(v.numel() for v in state.values())
    assert n_params == 17_060_948  # the reference count (PARITY.md)

    hr_dir = tmp_path / 'set5ish'
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(64, 64, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')

    from exsr.apps.scripts import official_parity
    out_dir = str(tmp_path / 'parity')
    summary = official_parity(pth, str(hr_dir), out_dir, nb=nb,
                              latent_channels=nz, num_z=1)
    assert summary['num_images'] == 2
    assert np.isfinite(summary['avg_psnr'])
    # the CEM consistency guarantee must hold through the converted model
    assert summary['avg_consistency_mae'] < 5e-5
    assert os.path.exists(os.path.join(out_dir, 'summary.json'))
