"""The latent / structure-tensor loss L_struct (reference: FilterLoss,
loss.py:27-209) — TPU-native.

Ties the latent control Z to measurable output statistics: per-image
structure-tensor moments of the SR output, normalized by HR statistics, must
track the Z channels mapped through running 5/95-percentile bounds.

The reference keeps the running statistics in 10k-element Python deques fed
``.item()`` by ``.item()`` (loss.py:67,101-127) — a host-sync per value.
Here the statistics live on device as a fixed ring buffer inside the train
state (:class:`RatioStats`), updated with one dynamic-slice write per step
and reduced with ``jnp.percentile`` — fully inside the jitted train step,
and checkpointable as a plain array pytree (the reference checkpoints its
deques the same way, SRRaGAN_model.py:651-652).

Supported latent-channel modes (loss.py:16-25):
  'structure_tensor', 'SVDinNormedOut_structure_tensor' (training default),
  'SVD_structure_tensor', 'STD_directional'.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.struct

from exsr.ops.structure_tensor import (image_gradients, svd_symmetric_2x2,
                                       valid_struct_tensor)

RESERVOIR = 10_000
LOWER_PCT, UPPER_PCT = 5.0, 95.0


@flax.struct.dataclass
class RatioStats:
    """Per-channel running ratio reservoir (device-resident)."""
    buffer: jnp.ndarray   # [num_channels, RESERVOIR]
    cursor: jnp.ndarray   # int32 scalar — next write position
    count: jnp.ndarray    # int32 scalar — total values ever written

    @classmethod
    def create(cls, num_channels: int, size: int = RESERVOIR
               ) -> 'RatioStats':
        return cls(buffer=jnp.zeros((num_channels, size), jnp.float32),
                   cursor=jnp.zeros((), jnp.int32),
                   count=jnp.zeros((), jnp.int32))

    def update(self, values: jnp.ndarray) -> 'RatioStats':
        """Append a [num_channels, B] batch of measured ratios (ring)."""
        nch, size = self.buffer.shape
        b = values.shape[1]
        idx = (self.cursor + jnp.arange(b)) % size
        buf = self.buffer.at[:, idx].set(values.astype(jnp.float32))
        return RatioStats(buffer=buf,
                          cursor=(self.cursor + b) % size,
                          count=self.count + b)

    def bounds(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(lower, upper) = 5/95 percentiles over the filled portion."""
        nch, size = self.buffer.shape
        pos = jnp.arange(size)[None, :]
        filled = pos < jnp.minimum(self.count, size)
        vals = jnp.where(filled, self.buffer, jnp.nan)
        lower = jnp.nanpercentile(vals, LOWER_PCT, axis=1)
        upper = jnp.nanpercentile(vals, UPPER_PCT, axis=1)
        return lower, upper


def structure_tensor_moments(img: jnp.ndarray) -> jnp.ndarray:
    """[3, B]: spatial+channel means of (Ix^2, Iy^2, IxIy)
    (loss.py:140-148)."""
    ix, iy = image_gradients(img)
    moments = jnp.stack([ix * ix, iy * iy, ix * iy], axis=0)
    return moments.mean(axis=(2, 3, 4))


def num_latent_channels(latent_channels: str | int) -> int:
    """loss.py:16-25."""
    import re
    if isinstance(latent_channels, int):
        return latent_channels
    if latent_channels == 'STD_1dir':
        return 2
    m = re.search(r'(\d)+', latent_channels)
    return int(m.group(0)) if m else 3


@dataclasses.dataclass(frozen=True)
class FilterLossConfig:
    latent_channels: str = 'SVDinNormedOut_structure_tensor'
    noise_std: float = 1.0 / 255.0   # SR task (loss.py:50)


def filter_loss(cfg: FilterLossConfig, stats: RatioStats,
                sr: jnp.ndarray, hr: jnp.ndarray, z: jnp.ndarray,
                svd: dict[str, jnp.ndarray] | None = None
                ) -> tuple[jnp.ndarray, RatioStats]:
    """Per-image L_struct [B, C] and the updated running stats.

    ``z`` is the HR-domain latent map [B, H, W, C]; its spatial mean is the
    per-image control (loss.py:89).  For 'SVD_structure_tensor', ``svd``
    carries the (lambda0_ratio, lambda1_ratio, theta) target maps the Z was
    synthesized from (loss.py:184-190).
    """
    mode = cfg.latent_channels
    cur_z = z.mean(axis=(1, 2))  # [B, C]

    if mode == 'STD_directional':
        return _std_directional(cfg, stats, sr, hr, cur_z)

    m_sr = structure_tensor_moments(sr)   # [3, B]
    m_hr = structure_tensor_moments(hr)

    if mode == 'SVD_structure_tensor':
        lam0_s, lam1_s, th_s = svd_symmetric_2x2(*m_sr)
        lam0_h, lam1_h, th_h = svd_symmetric_2x2(*m_hr)
        valid = (valid_struct_tensor(*m_sr) & valid_struct_tensor(*m_hr))
        measured = jnp.stack([lam0_s / (lam0_h + cfg.noise_std),
                              lam1_s / (lam1_h + cfg.noise_std),
                              th_s], axis=0)  # [3, B]
        new_stats = stats.update(measured)
        lower, upper = new_stats.bounds()
        mid = (upper + lower) / 2.0
        span = upper - lower
        # lambda channels: normalize measured into [0,1]-ish ratio space and
        # compare against the sampled lambda-ratio targets; theta channel:
        # wrap-around absolute angular difference (loss.py:184-206)
        meas0 = (measured[0] - mid[0]) / (span[0] + 1e-30) + 0.5
        meas1 = (measured[1] - mid[1]) / (span[1] + 1e-30) + 0.5
        meas2 = measured[2] / np.pi
        tgt0 = svd['lambda0_ratio'].mean(axis=(1, 2))
        tgt1 = svd['lambda1_ratio'].mean(axis=(1, 2))
        tgt2 = (jnp.mod(svd['theta'], np.pi) - np.pi / 2).mean(
            axis=(1, 2)) / np.pi
        d0 = jnp.abs(meas0 - tgt0)
        d1 = jnp.abs(meas1 - tgt1)
        dt = meas2 - tgt2
        d2 = jnp.minimum(jnp.minimum(jnp.abs(dt), jnp.abs(dt + 1.0)),
                         jnp.abs(dt - 1.0))  # pi-periodic in /pi units
        diffs = jnp.stack([d0, d1, d2], axis=1)  # [B, 3]
        w = valid.astype(diffs.dtype)[:, None]
        loss = jnp.sum(diffs * w, axis=0) / jnp.maximum(w.sum(), 1.0)
        return loss, new_stats

    if mode == 'SVDinNormedOut_structure_tensor':
        normalizer = jnp.sqrt(m_hr[0]) * jnp.sqrt(m_hr[1])  # [B]
        measured = m_sr / (normalizer[None, :] + cfg.noise_std)
    elif mode == 'structure_tensor':
        # per-moment HR-ratio on the diagonal moments only (RATIO_LOSS=
        # 'OnlyDiagonals', loss.py:138,169-170); IxIy stays un-normalized
        measured = jnp.stack(
            [m_sr[0] / (m_hr[0] + jnp.sign(m_sr[0]) * cfg.noise_std),
             m_sr[1] / (m_hr[1] + jnp.sign(m_sr[1]) * cfg.noise_std),
             m_sr[2]], axis=0)
    else:
        # integer latent_channels = free Z channels with no structural
        # control mapping — the reference's FilterLoss rejects it too
        # (loss.py:64 'Unknown latent channel setting'); train with
        # latent_weight unset/0 or pick a named mode
        raise NotImplementedError(
            f'latent_channels={mode!r} has no L_struct mapping — use a '
            "named mode ('SVDinNormedOut_structure_tensor', "
            "'structure_tensor', 'SVD_structure_tensor', "
            "'STD_directional') or disable latent_weight")

    new_stats = stats.update(measured)
    lower, upper = new_stats.bounds()
    mid = (upper + lower) / 2.0
    span = upper - lower
    target = cur_z / 2.0 * span[None, :] + mid[None, :]  # [B, 3]
    loss = jnp.abs(measured.T - target)  # [B, 3]
    return loss, new_stats


def _std_directional(cfg, stats, sr, hr, cur_z):
    """'STD_directional' mode (loss.py:108-128): channel 0 controls the
    directional-residual STD ratio, channels 1:3 the direction+magnitude."""
    def central_diffs(img):
        dx = (img[:, :, 2:, :] - img[:, :, :-2, :])[:, 1:-1, :, :] / 2
        dy = (img[:, 2:, :, :] - img[:, :-2, :, :])[:, :, 1:-1, :] / 2
        return dx, dy

    dx_s, dy_s = central_diffs(sr)
    dx_h, dy_h = central_diffs(hr)
    dirn = cur_z[:, 1:3]
    dirn = dirn / jnp.sqrt(jnp.sum(dirn ** 2, axis=1, keepdims=True) + 1e-30)
    d_s = (dirn[:, 0, None, None, None] * dx_s
           + dirn[:, 1, None, None, None] * dy_s)
    d_h = (dirn[:, 0, None, None, None] * dx_h
           + dirn[:, 1, None, None, None] * dy_h)
    mag_ratio = jnp.abs(d_s).mean(axis=(1, 2, 3)) / (
        jnp.abs(d_h).mean(axis=(1, 2, 3)) + cfg.noise_std)
    std_ratio = jnp.abs(sr[:, 1:-1, 1:-1] - d_s).mean(axis=(1, 2, 3)) / (
        jnp.abs(hr[:, 1:-1, 1:-1] - d_h).mean(axis=(1, 2, 3))
        + cfg.noise_std)
    measured = jnp.stack([std_ratio, mag_ratio], axis=0)  # [2, B]
    new_stats = stats.update(measured)
    lower, upper = new_stats.bounds()
    mid, span = (upper + lower) / 2.0, upper - lower
    mag_normal = jnp.sqrt(jnp.sum(cur_z[:, 1:3] ** 2, axis=1))
    target = jnp.stack([cur_z[:, 0] * span[0] + mid[0],
                        mag_normal / np.sqrt(2) * span[1] + mid[1]], axis=1)
    return jnp.abs(measured.T - target), new_stats
