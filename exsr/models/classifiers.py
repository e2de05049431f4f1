"""SVHN digit classifier + legacy SRGAN-era generators — flax.linen, NHWC.

* :class:`SVHNClassifier` — the multi-digit SVHN model used by the JPEG
  GUI's 'digit' exploration objective (utils/SVHN_classifier_model.py,
  potterhsu/SVHNClassifier architecture): 8 conv+BN+maxpool blocks, two
  3072 FC layers, 6 heads (length + 5 digits).  ``load_torch_state_dict``
  converts a locally provided .pth checkpoint.
* :class:`MSRResNet` / :class:`SRResNet` — the legacy plain-SR generators
  (architecture.py:18-103) kept for API completeness (plain ESRGAN/SRGAN
  inference, the GUI's reference-ESRGAN display slot).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from exsr.models.rrdb import kaiming_conv_init
from exsr.ops.filters import nearest_upsample, bilinear_resize


def _maxpool_torch(x, stride: int):
    """torch MaxPool2d(kernel=2, stride=s, padding=1) — pad with -inf then
    VALID pool (torch pads before pooling)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(stride, stride))


class SVHNClassifier(nn.Module):
    """Returns (length_logits[7], digit1..digit5 logits[11]).

    Input: [N, 54, 54, 3] images normalized to [-1, 1]
    (Z_optimization.py:558,588)."""
    deterministic: bool = True   # eval_with_grads mode: no dropout

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = [48, 64, 128, 160, 192, 192, 192, 192]
        for i, f in enumerate(feats):
            x = nn.Conv(f, (5, 5), padding=[(2, 2), (2, 2)],
                        name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, name=f'bn{i}')(x)
            x = nn.relu(x)
            x = _maxpool_torch(x, stride=2 if i % 2 == 0 else 1)
            if not self.deterministic:
                x = nn.Dropout(0.2, deterministic=not train)(x)
        # torch flattens NCHW [N,192,7,7]; transpose for weight parity
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(3072, name='fc9')(x))
        x = nn.relu(nn.Dense(3072, name='fc10')(x))
        heads = [nn.Dense(7, name='digit_length')(x)]
        heads += [nn.Dense(11, name=f'digit{i}')(x) for i in range(1, 6)]
        return tuple(heads)


def load_svhn_torch_state_dict(path: str):
    """Convert the reference SVHN .pth checkpoint into SVHNClassifier
    params (one-time tooling; torch CPU is available in this image)."""
    import torch
    raw = torch.load(path, map_location='cpu', weights_only=True)
    state = {k: v.numpy() for k, v in raw.items()}
    params, batch_stats = {}, {}
    for i in range(8):
        pre = f'_hidden{i + 1}.0'
        params[f'conv{i}'] = {
            'kernel': np.transpose(state[f'{pre}.weight'], (2, 3, 1, 0)),
            'bias': state[f'{pre}.bias']}
        bn = f'_hidden{i + 1}.1'
        params[f'bn{i}'] = {'scale': state[f'{bn}.weight'],
                            'bias': state[f'{bn}.bias']}
        batch_stats[f'bn{i}'] = {'mean': state[f'{bn}.running_mean'],
                                 'var': state[f'{bn}.running_var']}
    for name, key in (('fc9', '_hidden9.0'), ('fc10', '_hidden10.0'),
                      ('digit_length', '_digit_length.0'),
                      *[(f'digit{i}', f'_digit{i}.0')
                        for i in range(1, 6)]):
        params[name] = {'kernel': state[f'{key}.weight'].T,
                        'bias': state[f'{key}.bias']}
    to_jnp = lambda t: jnp.asarray(np.asarray(t))
    import jax
    return {'params': jax.tree.map(to_jnp, params),
            'batch_stats': jax.tree.map(to_jnp, batch_stats)}


class MSRResNet(nn.Module):
    """Modified SRResNet (architecture.py:18-66): residual blocks without
    BN, pixel-shuffle upsampling, bilinear global skip."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        inp = x
        fea = nn.leaky_relu(nn.Conv(
            self.nf, (3, 3), padding='SAME',
            kernel_init=kaiming_conv_init(0.1), name='conv_first')(x), 0.1)
        out = fea
        for i in range(self.nb):
            res = nn.relu(nn.Conv(self.nf, (3, 3), padding='SAME',
                                  name=f'rb{i}_conv1')(out))
            res = nn.Conv(self.nf, (3, 3), padding='SAME',
                          name=f'rb{i}_conv2')(res)
            out = out + res
        n_up = 1 if self.upscale == 3 else int(np.log2(self.upscale))
        for i in range(n_up):
            f = 3 if self.upscale == 3 else 2
            out = nn.Conv(self.nf * f * f, (3, 3), padding='SAME',
                          kernel_init=kaiming_conv_init(0.1),
                          name=f'upconv{i + 1}')(out)
            # pixel shuffle
            n, h, w, c = out.shape
            out = out.reshape(n, h, w, f, f, c // (f * f))
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h * f, w * f, c // (f * f))
            out = nn.leaky_relu(out, 0.1)
        out = nn.leaky_relu(nn.Conv(self.nf, (3, 3), padding='SAME',
                                    kernel_init=kaiming_conv_init(0.1),
                                    name='HRconv')(out), 0.1)
        out = nn.Conv(self.out_nc, (3, 3), padding='SAME',
                      kernel_init=kaiming_conv_init(0.1),
                      name='conv_last')(out)
        base = bilinear_resize(inp, inp.shape[1] * self.upscale,
                               inp.shape[2] * self.upscale)
        return out + base


class SRResNet(nn.Module):
    """Plain SRResNet (architecture.py:69-103): fea conv, nb ResNet blocks
    inside a long skip, nearest-upconv stages, two HR convs."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        fea = nn.Conv(self.nf, (3, 3), padding='SAME', name='fea_conv')(x)
        out = fea
        for i in range(self.nb):
            res = nn.relu(nn.Conv(self.nf, (3, 3), padding='SAME',
                                  name=f'rb{i}_conv1')(out))
            res = nn.Conv(self.nf, (3, 3), padding='SAME',
                          name=f'rb{i}_conv2')(res)
            out = out + res
        out = nn.Conv(self.nf, (3, 3), padding='SAME', name='lr_conv')(out)
        out = fea + out
        n_up = 1 if self.upscale == 3 else int(np.log2(self.upscale))
        for i in range(n_up):
            f = 3 if self.upscale == 3 else 2
            out = nearest_upsample(out, f)
            out = nn.relu(nn.Conv(self.nf, (3, 3), padding='SAME',
                                  name=f'upconv{i}')(out))
        out = nn.relu(nn.Conv(self.nf, (3, 3), padding='SAME',
                              name='hr_conv0')(out))
        return nn.Conv(self.out_nc, (3, 3), padding='SAME',
                       name='hr_conv1')(out)
