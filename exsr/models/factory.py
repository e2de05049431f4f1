"""Feature-extractor factory (reference define_F, networks.py:185-202 +
the VGGFeatureExtractor arch dispatch, architecture.py:658-724).

Maps the reference's arch vocabulary onto the flax modules:
  * 'vgg19' (default) / 'vgg19_<layer>' — VGG19 trunk cut at torchvision
    ``features`` index <layer> (34 = conv5_4 pre-ReLU, the perceptual-loss
    standard);
  * 'SegNetAE' — the 4-stage SegNet encoder on un-normalized inputs
    (architecture.py:665-674);
  * 'minc' — MINCNet (architecture.py:752-792);
  * 'resnet101' — ResNet101Features (architecture.py:728-749).

Returns ``(module, apply)`` where ``apply(variables, images_nhwc)`` gives
the feature maps; weights come from the matching converters
(``load_torch_vgg19_features`` etc.) or random init when no checkpoint is
available in this environment.
"""
from __future__ import annotations

from exsr.models.encoders import SegNet
from exsr.models.perceptual import MINCNet, ResNet101Features
from exsr.models.vgg import VGG19Features

# torchvision 'features' index -> (num_convs kept, what the index lands
# on).  vgg19's layout alternates conv/relu with 'M' pools; the reference
# keeps ``features[:feature_layer + 1]`` (architecture.py:683), so a cut can
# land on a conv (pre-ReLU output, e.g. 34 == conv5_4), a relu, or a pool.
_VGG19_LAYER_MAP = {}
_idx = 0
_conv = 0
for _item in (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M'):
    if _item == 'M':
        _VGG19_LAYER_MAP[_idx] = (_conv, 'pool')
        _idx += 1
    else:
        _conv += 1
        _VGG19_LAYER_MAP[_idx] = (_conv, 'conv')
        _VGG19_LAYER_MAP[_idx + 1] = (_conv, 'relu')
        _idx += 2


def make_feature_extractor(arch: str = 'vgg19', feature_layer: int = 34):
    """Build the perceptual network named by the reference vocabulary."""
    if arch.startswith('vgg'):
        if '_' in arch:
            feature_layer = int(arch.split('_', 1)[1])
        num_convs, trailing = _VGG19_LAYER_MAP[feature_layer]
        mod = VGG19Features(num_convs=num_convs, trailing=trailing)
    elif arch == 'SegNetAE':
        mod = SegNet(encode_only=True, num_layers=4, batch_norm_ds=False)
    elif arch == 'minc':
        mod = MINCNet()
    elif arch == 'resnet101':
        mod = ResNet101Features()
    else:
        raise ValueError(f'unknown feature-extractor arch: {arch!r}')
    return mod, mod.apply
