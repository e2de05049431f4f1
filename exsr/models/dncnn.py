"""DnCNN — the explorable-JPEG generator/discriminator (flax.linen, NHWC).

The JPEG twin of the RRDB generator: a plain conv stack operating in the
DCT-coefficient domain (channels-last: [N, h/8, w/8, 64] for luma).
Reference: architecture.py:109-225.

Generator semantics reproduced:
  * Z concatenated to the input of every conv ('all_layers') or only the
    first ('first_layer') — architecture.py:194-198;
  * residual quantization-error-estimation head:
    ``out = quantized_coeffs + (sigmoid(x) - 0.5)`` — architecture.py:204-214
    (the sigmoid bounds the correction to one quantization bin, which is what
    makes the in-model consistency enforcement an identity —
    DecompCNN_model.py:269-270);
  * chroma generator variant: predicts 2 chroma channels' coefficients, adds
    the quantized low-freq (8x8) coefficients onto the low-freq quadrant of a
    block_size x block_size prediction — architecture.py:207-212.

Discriminator semantics reproduced: optional spectral norm, LayerNorm for
WGAN (elementwise_affine=False), progressive VALID padding once the field is
large enough, FC or pooling head — architecture.py:119-186.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from exsr.ops.filters import bilinear_resize


class SpectralNormConv(nn.Module):
    """Conv2d with spectral weight normalization (power iteration, 1 step
    per call), matching torch.nn.utils.spectral_norm semantics
    (reference: codes/models/modules/spectral_norm.py)."""
    features: int
    kernel: int
    padding: str | int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        kh = kw = self.kernel
        in_ch = x.shape[-1]
        w = self.param('kernel', nn.initializers.kaiming_normal(),
                       (kh, kw, in_ch, self.features))
        b = (self.param('bias', nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        w_mat = w.reshape(-1, self.features)
        u = self.variable('spectral', 'u',
                          lambda: jax.random.normal(
                              self.make_rng('params') if self.is_initializing()
                              else jax.random.PRNGKey(0), (self.features,)))
        u_val = u.value
        v = w_mat @ u_val
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w_mat.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = v @ w_mat @ u_new
        if update_stats and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        w_sn = w / jax.lax.stop_gradient(sigma)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        out = jax.lax.conv_general_dilated(
            x, w_sn, (1, 1), pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if b is not None:
            out = out + b
        return out


@dataclasses.dataclass(frozen=True)
class DnCNNConfig:
    n_channels: int = 320          # nf (train_JPEG.json:54-56)
    depth: int = 10                # nb
    kernel_size: int = 3
    in_nc: int = 64
    out_nc: int = 64
    norm: str | None = 'batch'     # 'batch' | 'layer' | 'instance' | None
    latent_input: str | None = 'all_layers'
    num_latent_channels: int = 0
    chroma_generator: bool = False
    block_size: int = 8            # chroma works on 16x16 DCT blocks


class DnCNN(nn.Module):
    """Generator variant (the discriminator is :class:`DnCNNDiscriminator`)."""
    cfg: DnCNNConfig

    @nn.compact
    def __call__(self, quantized_coeffs, z=None, train: bool = True):
        cfg = self.cfg
        nz = cfg.num_latent_channels if cfg.latent_input else 0
        x = quantized_coeffs

        def maybe_cat(v, i):
            if nz and (cfg.latent_input == 'all_layers'
                       or (cfg.latent_input == 'first_layer' and i == 0)):
                return jnp.concatenate([z, v], axis=-1)
            return v

        for i in range(cfg.depth):
            last = i == cfg.depth - 1
            feats = cfg.out_nc if last else cfg.n_channels
            x = nn.Conv(feats, (cfg.kernel_size, cfg.kernel_size),
                        padding='SAME', use_bias=(i == 0),
                        name=f'conv{i}')(maybe_cat(x, i))
            if last:
                break
            if i == 0:
                x = nn.relu(x)
            else:
                if cfg.norm == 'batch':
                    # reference: BatchNorm2d(eps=1e-4, momentum=0.95)
                    # (architecture.py:161). torch momentum is the NEW-
                    # batch weight (ra = 0.05*ra + 0.95*new); flax's is
                    # the OLD weight — the equivalent flax momentum is
                    # 1 - 0.95 = 0.05
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.05, epsilon=1e-4)(x)
                elif cfg.norm == 'instance':
                    m = x.mean(axis=(1, 2), keepdims=True)
                    v = x.var(axis=(1, 2), keepdims=True)
                    x = (x - m) / jnp.sqrt(v + 1e-5)
                x = nn.leaky_relu(x, 0.01)
        x = nn.sigmoid(x)
        err = x - 0.5  # bounded to one quantization bin
        if cfg.chroma_generator:
            bs = cfg.block_size
            n, h, w, _ = err.shape
            # err predicts 2 chroma channels of bs*bs coefficients; the
            # quantized low-freq (8x8) coefficients are added onto the
            # low-freq quadrant (architecture.py:207-212).
            err = err.reshape(n, h, w, 2, bs // 8, 8, bs // 8, 8)
            q = quantized_coeffs[..., 256:]
            q = q.reshape(n, h, w, 2, 8, 8)
            err = err.at[..., 0, :, 0, :].add(q)
            return err.reshape(n, h, w, -1)
        return quantized_coeffs + err


class DnCNNDiscriminator(nn.Module):
    """DCT-domain critic (architecture.py:119-186).

    Progressive VALID padding: padding stays SAME for the first
    ``num_padded_layers`` convs (so tiny DCT grids keep >= 5x5 before the
    head) then switches to VALID; LayerNorm (no affine) for WGAN;
    optional spectral norm; FC head over flattened features or fully-conv
    pooling head (``pooling_no_fc``).
    """
    n_channels: int = 320
    depth: int = 10
    kernel_size: int = 3
    expected_input_size: int = 32   # patch/8
    norm: str | None = 'layer'
    latent_input: str | None = None
    num_latent_channels: int = 0
    spectral_norm: bool = False
    pooling_no_fc: bool = False
    out_nc: int = 64

    @nn.compact
    def __call__(self, x, z=None, train: bool = True):
        min_dims = 5
        k = self.kernel_size
        num_padded = max(0, self.depth - int(np.floor(
            (self.expected_input_size - min_dims) / (k - 1))))
        size = self.expected_input_size
        nz = self.num_latent_channels if self.latent_input else 0

        def conv(v, feats, i, padded, use_bias):
            pad = (k - 1) // 2 if padded else 0
            if self.spectral_norm:
                return SpectralNormConv(feats, k, padding=pad,
                                        use_bias=use_bias,
                                        name=f'conv{i}')(v)
            return nn.Conv(feats, (k, k), padding=[(pad, pad), (pad, pad)],
                           use_bias=use_bias, name=f'conv{i}')(v)

        for i in range(self.depth):
            padded = i < num_padded
            if not padded:
                size -= k - 1
            if nz and self.latent_input in ('all_layers', 'first_layer') \
                    and (self.latent_input == 'all_layers' or i == 0):
                zi = z
                if z.shape[1] != x.shape[1]:
                    zi = bilinear_resize(z, x.shape[1], x.shape[2])
                x = jnp.concatenate([zi, x], axis=-1)
            last = i == self.depth - 1
            if last:
                feats = 1 if self.pooling_no_fc else self.out_nc
                x = conv(x, feats, i, padded, use_bias=self.pooling_no_fc)
                break
            feats = self.n_channels
            x = conv(x, feats, i, padded, use_bias=(i == 0))
            if i == 0:
                x = nn.relu(x)
            else:
                if self.norm == 'layer':
                    # LayerNorm over (H, W, C), elementwise_affine=False
                    m = x.mean(axis=(1, 2, 3), keepdims=True)
                    v = x.var(axis=(1, 2, 3), keepdims=True)
                    x = (x - m) / jnp.sqrt(v + 1e-5)
                elif self.norm == 'batch':
                    # torch momentum 0.95 (new-batch weight) == flax 0.05
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.05, epsilon=1e-4)(x)
                x = nn.leaky_relu(x, 0.01)
        if self.pooling_no_fc:
            return x
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1)(x)
