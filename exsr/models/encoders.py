"""Auxiliary encoder networks: SegNet (autoencoder) and E_ResNet.

Reference counterparts:
  * ``SegNet`` — codes/models/modules/SegNet.py:5-149.  A VGG-style
    encoder/decoder with max-pool argmax "unpooling"; the framework uses the
    encoder half as the 'SegNetAE' perceptual feature extractor
    (architecture.py:665-674).
  * ``E_ResNet`` — codes/models/modules/architecture.py:795-860.  A
    BicycleGAN-style image encoder (pre-activation residual blocks with
    mean-pool downsampling, optional VAE dual heads).

TPU-first notes: NHWC layout; the argmax pool/unpool pair is expressed with
static 2x2 cell reshapes + one-hot scatter (a single fused gather/select in
XLA) instead of torch's dynamic flat-index MaxUnpool2d — no dynamic shapes
or data-dependent indexing under jit.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def max_pool_argmax(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2x2/stride-2 max pool returning (pooled, one-hot argmax selectors).

    ``sel`` is [N, H/2, W/2, 4, C] with a 1 at each cell's argmax — the
    jit-friendly equivalent of MaxPool2d(return_indices=True)
    (SegNet.py:44,64).  Ties resolve to the first cell element, matching
    torch argmax order (row-major within the 2x2 cell).
    """
    n, h, w, c = x.shape
    cells = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    cells = cells.reshape(n, h // 2, w // 2, 4, c)
    pooled = cells.max(axis=3)
    idx = cells.argmax(axis=3)
    sel = jnp.asarray(idx[..., None, :] ==
                      jnp.arange(4)[None, None, None, :, None], x.dtype)
    return pooled, sel


def max_unpool(x: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """Scatter pooled values back to their argmax positions (MaxUnpool2d,
    SegNet.py:82,96); zeros elsewhere."""
    n, hp, wp, c = x.shape
    cells = x[:, :, :, None, :] * sel            # [N, H/2, W/2, 4, C]
    cells = cells.reshape(n, hp, wp, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return cells.reshape(n, hp * 2, wp * 2, c)


class ConvBNRelu(nn.Module):
    """conv2DBatchNormRelu (SegNet.py:5-36): 3x3 conv + optional BN + ReLU."""
    features: int
    with_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1)(x)
        if self.with_bn:
            # torch default momentum 0.1 (new-batch weight) == flax 0.9
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(x)
        return nn.relu(x)


class SegNetDown(nn.Module):
    """segnetDown2/segnetDown3 (SegNet.py:39-77): n convs then argmax pool."""
    features: int
    n_convs: int
    with_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n_convs):
            x = ConvBNRelu(self.features, self.with_bn)(x, train)
        pooled, sel = max_pool_argmax(x)
        return pooled, sel


class SegNetUp(nn.Module):
    """segnetUp2/segnetUp3 (SegNet.py:79-107): unpool then n BN convs."""
    mid_features: int
    out_features: int
    n_convs: int

    @nn.compact
    def __call__(self, x, sel, train: bool = False):
        x = max_unpool(x, sel)
        for i in range(self.n_convs):
            feats = (self.out_features if i == self.n_convs - 1
                     else self.mid_features)
            x = ConvBNRelu(feats, True)(x, train)
        return x


class SegNet(nn.Module):
    """SegNet autoencoder (SegNet.py:109-149).

    ``encode_only=True`` reproduces the 'SegNetAE' perceptual feature
    extractor (architecture.py:665-674): the 4- or 5-stage VGG encoder,
    expecting UN-normalized [0,1] inputs.  Spatial dims must be divisible
    by 2**num_layers.
    """
    n_classes: int = 3
    num_layers: int = 5          # 4 or 5 encoder/decoder stages
    encode_only: bool = False
    batch_norm_ds: bool = True   # BN in the downsampling path

    # (encoder widths, conv counts) per stage — SegNet.py:117-121
    WIDTHS: Sequence[int] = (64, 128, 256, 512, 512)
    NCONVS: Sequence[int] = (2, 2, 3, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_layers in (4, 5)
        sels = []
        for i in range(self.num_layers):
            x, sel = SegNetDown(self.WIDTHS[i], self.NCONVS[i],
                                self.batch_norm_ds,
                                name=f'down{i + 1}')(x, train)
            sels.append(sel)
        if self.encode_only:
            return x
        # decoder stage i undoes encoder stage i; widths step back down
        # (SegNet.py:123-127,139-148)
        for i in reversed(range(self.num_layers)):
            out_feats = self.WIDTHS[i - 1] if i > 0 else self.n_classes
            x = SegNetUp(self.WIDTHS[i], out_feats, self.NCONVS[i],
                         name=f'up{i + 1}')(x, sels[i], train)
        return x


class BasicBlock(nn.Module):
    """Pre-activation residual block with mean-pool downsampling
    (architecture.py:787-830): [nl, conv3x3, nl, conv3x3+avgpool] +
    [avgpool + conv1x1] shortcut."""
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        h = nn.Conv(self.in_features, (3, 3), padding=1)(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_features, (3, 3), padding=1)(h)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        s = nn.avg_pool(x, (2, 2), strides=(2, 2))
        s = nn.Conv(self.out_features, (1, 1))(s)
        return h + s


class EResNet(nn.Module):
    """E_ResNet image encoder (architecture.py:831-860).

    k4/s2 stem, then (n_blocks - 1) BasicBlocks with widths
    ndf * min(4, n + 1), a final nonlinearity, 8x8 average pooling, and a
    dense head; ``vae_like`` adds a second head for the log-variance.  The
    reference leaves norm_layer unset at every call site, so no
    normalization is applied here either.
    """
    output_nc: int = 1
    ndf: int = 64
    n_blocks: int = 4
    vae_like: bool = False

    @nn.compact
    def __call__(self, x):
        max_ndf = 4
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1)(x)
        width = self.ndf
        for n in range(1, self.n_blocks):
            width = self.ndf * min(max_ndf, n + 1)
            x = BasicBlock(self.ndf * min(max_ndf, n), width)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.avg_pool(x, (8, 8), strides=(8, 8))
        flat = x.reshape(x.shape[0], -1)
        out = nn.Dense(self.output_nc, name='fc')(flat)
        if self.vae_like:
            return out, nn.Dense(self.output_nc, name='fcVar')(flat)
        return out
