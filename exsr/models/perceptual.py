"""Auxiliary perceptual feature extractors (reference architecture.py:728-879).

These are off the reference's main training path (networks.py:197 always
builds VGG); provided for API completeness:
  * :class:`MINCNet` — VGG16-style material-classification feature trunk
    (architecture.py:752-792);
  * :class:`ResNet101Features` — torchvision resnet101 through layer4
    (architecture.py:728-749), with ImageNet input normalization.
Weight converters accept local torch state dicts (no egress here).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from exsr.models.vgg import IMAGENET_MEAN, IMAGENET_STD


class MINCNet(nn.Module):
    """VGG16-like trunk, final conv without activation
    (architecture.py:752-792)."""

    @nn.compact
    def __call__(self, x):
        plan = [(2, 64), (2, 128), (3, 256), (3, 512)]
        i = 0
        for n_convs, feats in plan:
            for _ in range(n_convs):
                x = nn.relu(nn.Conv(feats, (3, 3), padding='SAME',
                                    name=f'conv{i}')(x))
                i += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(512, (3, 3), padding='SAME',
                            name=f'conv{i}')(x))
        x = nn.relu(nn.Conv(512, (3, 3), padding='SAME',
                            name=f'conv{i + 1}')(x))
        return nn.Conv(512, (3, 3), padding='SAME',
                       name=f'conv{i + 2}')(x)


class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.project:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(
                residual)
        return nn.relu(y + residual)


class ResNet101Features(nn.Module):
    """resnet101 trunk through layer4 with ImageNet normalization
    (architecture.py:728-749)."""
    use_input_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for features, blocks, stride in ((64, 3, 1), (128, 4, 2),
                                         (256, 23, 2), (512, 3, 2)):
            x = BottleneckBlock(features, stride=stride, project=True)(
                x, train)
            for _ in range(blocks - 1):
                x = BottleneckBlock(features)(x, train)
        return x
