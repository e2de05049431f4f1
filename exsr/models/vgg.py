"""VGG19 perceptual feature extractor — flax.linen, NHWC.

Mirrors the reference's VGGFeatureExtractor (architecture.py:658-724) /
define_F (networks.py:185-202): torchvision VGG19 ``features[:35]`` — i.e.
through conv5_4, *before* its ReLU ("VGG19-54"), with ImageNet input
normalization, frozen weights.

This environment has no torchvision and no egress, so pretrained weights
cannot be fetched here; :func:`load_torch_vgg19_features` converts a locally
provided torchvision ``vgg19`` state-dict (.pth) into our parameter pytree
(one-time tooling, SURVEY.md section "hard parts": pretrained-weight
conversion).  Without weights the extractor runs with its random
(kaiming) init — still a usable perceptual metric, clearly weaker than
pretrained.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg19 'features' layout: conv channel plan with 'M' = maxpool.
VGG19_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
             512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M')

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class VGG19Features(nn.Module):
    """VGG19 trunk truncated after ``num_convs`` convolutions.

    ``feature_layer=34`` in the reference == stop after the 16th conv
    (conv5_4) with no trailing ReLU; that corresponds to num_convs=16.
    """
    num_convs: int = 16
    use_input_norm: bool = True
    # what the cut index landed on in torchvision's ``features`` layout:
    # 'conv' (stop pre-ReLU, the VGG19-54 standard), 'relu' (keep the last
    # conv's ReLU), or 'pool' (keep through the following maxpool)
    trailing: str = 'conv'

    @nn.compact
    def __call__(self, x):
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        conv_idx = 0
        done = False
        for item in VGG19_CFG:
            if item == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if done:  # trailing == 'pool'
                    return x
                continue
            if done:
                return x
            x = nn.Conv(item, (3, 3), padding='SAME',
                        name=f'conv{conv_idx}')(x)
            conv_idx += 1
            if conv_idx == self.num_convs:
                if self.trailing == 'conv':
                    return x  # stop BEFORE this conv's ReLU (VGG19-54)
                x = nn.relu(x)
                if self.trailing == 'relu':
                    return x
                done = True   # 'pool': run until the next maxpool
                continue
            x = nn.relu(x)
        return x


def load_torch_vgg19_features(path: str, num_convs: int = 16):
    """Convert a torchvision vgg19 state-dict file into VGG19Features params.

    Accepts either a torch ``.pth`` (requires torch, present in this image)
    or an ``.npz`` with keys ``features.<i>.weight`` / ``.bias``.  Torch
    OIHW conv weights become HWIO.
    """
    if path.endswith('.npz'):
        state = dict(np.load(path))
    else:
        import torch
        raw = torch.load(path, map_location='cpu', weights_only=True)
        state = {k: v.numpy() for k, v in raw.items()}
    # torchvision indices of conv layers inside 'features'
    conv_indices = []
    idx = 0
    for item in VGG19_CFG:
        if item == 'M':
            idx += 1
        else:
            conv_indices.append(idx)
            idx += 2  # conv + relu
    params = {}
    for ci, ti in enumerate(conv_indices[:num_convs]):
        w = state.get(f'features.{ti}.weight')
        b = state.get(f'features.{ti}.bias')
        if w is None:
            raise KeyError(f'missing features.{ti}.weight in {path}')
        params[f'conv{ci}'] = {
            'kernel': jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            'bias': jnp.asarray(b),
        }
    return {'params': params}
