"""Discriminators — flax.linen, NHWC.

* :class:`DiscriminatorVGG128` — the configurable-depth VGG-style critic used
  for explorable SR (reference: architecture.py:446-508, config
  train_explorable_SR.json:56-67 — nb=10, num_2_strides=5, batch-norm,
  leaky-relu, FC head).  Patch-discriminator conv head when num_2_strides<5
  (architecture.py:490-501).
* :class:`PatchGANDiscriminator` — pix2pix-style PatchGAN with optional
  CEM-decomposed two-stream input and pre-clipping
  (architecture.py:309-388).

BatchNorm runs in train mode with batch statistics and keeps running
averages under the 'batch_stats' collection, matching torch semantics.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from exsr.models.rrdb import kaiming_conv_init
from exsr.ops.filters import bilinear_resize


class ConvBlock(nn.Module):
    """conv(+BN)(+lrelu), CNA order (block.py:129-155)."""
    features: int
    kernel: int = 3
    stride: int = 1
    norm: bool = True
    act: bool = True
    init_scale: float = 1.0
    padding: str | int = 'SAME'

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.padding
        if pad == 'SAME':
            # torch conv2d with padding=k//2: for even k this is asymmetric
            # relative to XLA's SAME; replicate torch's arithmetic exactly.
            p = (self.kernel - 1) // 2
            pad = [(p, p), (p, p)]
        elif isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=True,
                    kernel_init=kaiming_conv_init(self.init_scale))(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        if self.act:
            x = nn.leaky_relu(x, 0.2)
        return x


def _torch_conv_out(size: int, kernel: int, stride: int) -> int:
    """Output spatial size of torch Conv2d with padding=(kernel-1)//2."""
    p = (kernel - 1) // 2
    return (size + 2 * p - kernel) // stride + 1


class DiscriminatorVGG128(nn.Module):
    """VGG-style critic, depth nb<=10, num_2_strides stride-2 stages.

    With num_2_strides == 5 the head is FC (Linear(..., 100) -> lrelu ->
    Linear(100, 1)); otherwise a PatchGAN-ish conv head (kernel 8 valid +
    1x1) — architecture.py:488-508.  ``input_patch_size`` must be the true
    input size (CEM margins already subtracted — networks.py:134-135).
    """
    base_nf: int = 64
    nb: int = 10
    num_2_strides: int = 5
    input_patch_size: int = 128
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.base_nf
        strides_left = self.num_2_strides
        size = self.input_patch_size
        plan = []  # (features, kernel, norm)
        feats = [nf, nf, nf * 2, nf * 2, nf * 4, nf * 4, nf * 8, nf * 8,
                 nf * 8, nf * 8]
        for i in range(self.nb):
            k = 4 if i % 2 == 1 else 3
            s = 1
            if i % 2 == 1 and strides_left > 0:
                s = 2
                strides_left -= 1
            plan.append((feats[i], k, s, i != 0))
        for j, (f, k, s, norm) in enumerate(plan):
            x = ConvBlock(f, k, s, norm=norm, init_scale=self.init_scale,
                          name=f'conv{j}')(x, train)
            size = _torch_conv_out(size, k, s)
        if self.num_2_strides == 5:
            x = x.reshape(x.shape[0], -1)
            x = nn.leaky_relu(nn.Dense(100)(x), 0.2)
            return nn.Dense(1)(x)
        # patch head: conv k=8 VALID (+BN+lrelu), lrelu, 1x1 conv head.
        # DELIBERATE DEVIATION: the reference builds pseudo_FC_conv1 with
        # norm_type/act_type too (architecture.py:501), so with
        # norm_type='batch' the FINAL LOGIT is batch-normalized — which
        # pins the batch mean of D's output and makes real/fake means
        # inseparable under ANY GAN loss (measured: D_logits_diff stays
        # ~0.003 for 11k wgan-gp steps; scripts_dev/probe_d_learn.py shows
        # the same head cannot separate even trivially different
        # distributions at any LR, while this fixed head separates in a
        # few hundred steps). The reference never exercises that path (its
        # configs all use num_2_strides=5 -> FC head), so the flaw is
        # latent upstream; the logit conv here is norm/act-free, matching
        # every working critic head in the codebase (FC head, PatchGAN).
        assert size >= 8, (
            f'feature map {size}x{size} too small for the 8x8 patch head — '
            f'use fewer stride-2 stages or a larger input patch')
        nf_last = plan[-1][0]
        x = ConvBlock(min(100, nf_last), kernel=8, padding=0,
                      name='pseudo_fc0')(x, train)
        x = nn.leaky_relu(x, 0.2)
        x = ConvBlock(1, kernel=1, norm=False, act=False,
                      name='pseudo_fc1')(x, train)
        return x


class DiscriminatorVGG(nn.Module):
    """Fixed-size VGG-style critics for 96/192-px inputs
    (Discriminator_VGG_96 / _192, architecture.py:557-649): five (or six)
    conv pairs with stride-2 k4 stages down to 3x3x512, FC(100) head."""
    base_nf: int = 64
    input_size: int = 96

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.input_size in (96, 192)
        nf = self.base_nf
        feats = [nf, nf, nf * 2, nf * 2, nf * 4, nf * 4, nf * 8, nf * 8,
                 nf * 8, nf * 8]
        if self.input_size == 192:
            feats += [nf * 8, nf * 8]
        for i, f in enumerate(feats):
            k = 4 if i % 2 == 1 else 3
            s = 2 if i % 2 == 1 else 1
            x = ConvBlock(f, k, s, norm=(i != 0), name=f'conv{i}')(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(100)(x), 0.2)
        return nn.Dense(1)(x)


class DiscriminatorVGG128SN(nn.Module):
    """Spectral-norm VGG-128 critic (architecture.py:512-554)."""
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        from exsr.models.dncnn import SpectralNormConv
        nf = self.nf
        plan = [(nf, 3, 1), (nf, 4, 2), (2 * nf, 3, 1), (2 * nf, 4, 2),
                (4 * nf, 3, 1), (4 * nf, 4, 2), (8 * nf, 3, 1),
                (8 * nf, 4, 2), (8 * nf, 3, 1), (8 * nf, 4, 2)]
        for i, (f, k, s) in enumerate(plan):
            # SpectralNormConv has no stride arg; stride-2 k4-p1 equals
            # stride-1 conv followed by even-position subsampling
            pad = (k - 1) // 2
            x = SpectralNormConv(f, k, padding=pad, name=f'conv{i}')(x)
            if s == 2:
                x = x[:, ::2, ::2, :]
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(100)(x), 0.2)
        return nn.Dense(1)(x)


class ACDVGGBN96(nn.Module):
    """Auxiliary-classifier VGG-BN-96 discriminator (sft_arch.py:87):
    GAN head + 8-way segmentation-class head (SFT-GAN legacy)."""
    base_nf: int = 64
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.base_nf
        feats = [nf, nf, nf * 2, nf * 2, nf * 4, nf * 4, nf * 8, nf * 8,
                 nf * 8, nf * 8]
        for i, f in enumerate(feats):
            k = 4 if i % 2 == 1 else 3
            s = 2 if i % 2 == 1 else 1
            x = ConvBlock(f, k, s, norm=(i != 0), name=f'conv{i}')(x, train)
        x = x.reshape(x.shape[0], -1)
        gan = nn.Dense(100, name='gan_fc0')(x)
        gan = nn.Dense(1, name='gan_fc1')(nn.leaky_relu(gan, 0.2))
        cls = nn.Dense(100, name='cls_fc0')(x)
        cls = nn.Dense(self.num_classes,
                       name='cls_fc1')(nn.leaky_relu(cls, 0.2))
        return gan, cls


class PatchGANDiscriminator(nn.Module):
    """70x70-style PatchGAN critic (architecture.py:309-388).

    ``decomposed_input``: the CEM's (low-freq, high-freq) components flow
    through two streams — the projected component passes through per-stage
    stride-matched convs and is concatenated to the main stream's input at
    every stage.  ``pre_clipping`` clamps the input to the valid range
    before judging (architecture.py:370-379).
    """
    ndf: int = 64
    n_layers: int = 3
    decomposed_input: bool = False
    pre_clipping: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.decomposed_input:
            projected, x = x
            if self.pre_clipping:
                x = jnp.maximum(jnp.minimum(x, 1 - projected), -projected)
        elif self.pre_clipping:
            x = jnp.clip(x, 0.0, 1.0)

        def instance_norm(v):
            mean = v.mean(axis=(1, 2), keepdims=True)
            var = v.var(axis=(1, 2), keepdims=True)
            return (v - mean) / jnp.sqrt(var + 1e-5)

        max_out = 512
        stages = []  # (features, stride, norm)
        stages.append((self.ndf, 2, False))
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            stride = 2 if n > self.n_layers - 3 else 1
            stages.append((min(max_out, self.ndf * nf_mult), stride, True))
        nf_mult = min(2 ** self.n_layers, 8)
        stages.append((min(max_out, self.ndf * nf_mult), 1, True))
        stages.append((1, 1, False))

        proj = projected if self.decomposed_input else None
        for i, (f, s, norm) in enumerate(stages):
            if self.decomposed_input:
                if i > 0:
                    # proj conv i matches stage i-1's stride so the two
                    # streams stay spatially aligned (architecture.py:359-366,
                    # 381-385: proj sequence i-1 is applied before stage i).
                    s_prev = stages[i - 1][1]
                    proj = nn.Conv(proj.shape[-1], (4, 4),
                                   strides=(s_prev, s_prev),
                                   padding=[(1, 1), (1, 1)],
                                   name=f'proj{i}')(proj)
                inp = jnp.concatenate([proj, x], axis=-1)
            else:
                inp = x
            x = nn.Conv(f, (4, 4), strides=(s, s), padding=[(1, 1), (1, 1)],
                        use_bias=True, name=f'conv{i}')(inp)
            if norm:
                x = instance_norm(x)
            if i < len(stages) - 1:
                x = nn.leaky_relu(x, 0.2)
        return x
