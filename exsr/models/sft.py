"""SFT-GAN generator (spatial feature transform), TPU-native.

Reference: ``codes/models/modules/sft_arch.py:8-85`` (``SFTLayer``,
``ResBlock_SFT``, ``SFT_Net``).  Legacy architecture kept for inventory
completeness — the reference's ``define_G`` never dispatches to it (only
the ACD discriminator from the same file is reachable,
``networks.py:144-145``) — but users porting SFT-GAN checkpoints get the
same module vocabulary here.

TPU-first shape: NHWC, the 16 identical SFT residual blocks run as one
``lax.scan`` over stacked per-block params (one compiled block body instead
of 16 inlined copies), and PixelShuffle is ``jnp.reshape``/``transpose``
(depth-to-space) which XLA folds into the surrounding convs' layouts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """torch PixelShuffle semantics on NHWC (channel-major sub-pixels)."""
    n, h, w, c = x.shape
    co = c // (f * f)
    # torch layout: channels = (co, f, f) row-major on NCHW
    x = x.reshape(n, h, w, co, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * f, w * f, co)


class SFTLayer(nn.Module):
    """Affine modulation of features by a learned map of the condition
    (sft_arch.py:8-20): ``fea * (scale + 1) + shift``."""

    @nn.compact
    def __call__(self, fea, cond):
        s = nn.Conv(32, (1, 1), name='scale_conv0')(cond)
        s = nn.Conv(64, (1, 1), name='scale_conv1')(
            nn.leaky_relu(s, 0.1))
        t = nn.Conv(32, (1, 1), name='shift_conv0')(cond)
        t = nn.Conv(64, (1, 1), name='shift_conv1')(
            nn.leaky_relu(t, 0.1))
        return fea * (s + 1.0) + t


class ResBlockSFT(nn.Module):
    """SFT residual block (sft_arch.py:23-37)."""

    @nn.compact
    def __call__(self, fea, cond):
        y = SFTLayer(name='sft0')(fea, cond)
        y = nn.relu(nn.Conv(64, (3, 3), name='conv0')(y))
        y = SFTLayer(name='sft1')(y, cond)
        y = nn.Conv(64, (3, 3), name='conv1')(y)
        return fea + y


class _ScanResBlockSFT(nn.Module):
    """lax.scan body: the 16 identical SFT blocks share one compiled copy."""

    @nn.compact
    def __call__(self, fea, cond):
        return ResBlockSFT(name='block')(fea, cond), None


class SFTNet(nn.Module):
    """SFT-GAN generator (sft_arch.py:40-85): segmentation-conditioned 4x SR.

    ``__call__(img, seg)``: img NHWC (3ch), seg NHWC (8 class probability
    maps at HR-of-LR resolution, conv-4/4-downscaled into the condition).
    """
    n_blocks: int = 16

    @nn.compact
    def __call__(self, img: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        cond = nn.Conv(128, (4, 4), strides=(4, 4), padding='VALID',
                       name='cond0')(seg)
        cond = nn.leaky_relu(cond, 0.1)
        for i in range(1, 4):
            cond = nn.leaky_relu(
                nn.Conv(128, (1, 1), name=f'cond{i}')(cond), 0.1)
        cond = nn.Conv(32, (1, 1), name='cond4')(cond)

        fea = nn.Conv(64, (3, 3), name='conv0')(img)

        blocks = nn.scan(
            _ScanResBlockSFT,
            variable_axes={'params': 0},
            split_rngs={'params': True},
            in_axes=nn.broadcast,
            length=self.n_blocks)(name='sft_blocks')
        res, _ = blocks(fea, cond)
        res = SFTLayer(name='sft_final')(res, cond)
        res = nn.Conv(64, (3, 3), name='conv_final')(res)
        fea = fea + res

        x = nn.relu(_depth_to_space(
            nn.Conv(256, (3, 3), name='hr0')(fea), 2))
        x = nn.relu(_depth_to_space(
            nn.Conv(256, (3, 3), name='hr1')(x), 2))
        x = nn.relu(nn.Conv(64, (3, 3), name='hr2')(x))
        return nn.Conv(3, (3, 3), name='hr3')(x)
