"""CEM — Consistency Enforcing Module, TPU-native.

The CEM analytically decomposes an SR network's output into:
  * the component orthogonal to the downsampling kernel's null-space,
    computed *from the LR input alone*:  ``ortho = U (inv_hTh * y)``
  * the null-space component taken from the network:
    ``ns = g - U (inv_hTh * D g)``
so that ``D(ortho + ns) == y`` exactly (up to filter-inversion error).
U is consistent upscaling, D consistent downscaling (exsr.ops.filters).

Setup (kernel synthesis, inv_hTh inversion, margin probing) runs once on the
host in float64 (exsr.ops.resize / exsr.ops.inv_hth).  The forward path is a
pure jittable function over NHWC arrays; the filters are closed-over
constants, so XLA folds and fuses the whole chain.

Reference: /root/reference/codes/CEM/CEMnet.py (class CEMnet, CEM_PyTorch,
CEM_downsampler).  This is a re-design, not a port: no modules, no flags —
padding behavior is an explicit argument (`pre_pad`), and the generator is a
function, not a wrapped nn.Module.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from exsr.ops import filters as F
from exsr.ops import resize as R
from exsr.ops.inv_hth import (compute_inv_hth, invalid_margin_size_downscale)


@dataclasses.dataclass(frozen=True)
class CEMConf:
    """Configuration, mirroring CEMnet.Get_CEM_Conf (CEMnet.py:391-401)."""
    scale_factor: int
    filter_perturbation_limit: float = 0.999
    desired_inv_hth_energy_portion: float = 1 - 1e-6
    lower_magnitude_bound: float = 0.01
    sigmoid_range_limit: bool = False
    input_range: tuple[float, float] = (0.0, 1.0)
    decomposed_output: bool = False


@dataclasses.dataclass(frozen=True)
class CEM:
    """Analytic CEM state: filters + margins for one (scale, kernel) pair."""
    conf: CEMConf
    ds_kernel: np.ndarray               # h (float64, sums to 1)
    inv_hth: np.ndarray                 # inverse of aliased (h*h^T)
    ds_kernel_invalidity_half_size_lr: int
    inv_hth_invalidity_half_size: int
    invalidity_margins_lr: int
    invalidity_margins_hr: int

    @classmethod
    def create(cls, conf: CEMConf, upscale_kernel: np.ndarray | str | None
               = None, registry: R.KernelRegistry | None = None) -> 'CEM':
        """Build the CEM for a scale factor and optional estimated kernel.

        Mirrors CEMnet.__init__ (CEMnet.py:22-33).  ``upscale_kernel`` may be
        an estimated downscaling kernel ndarray (e.g. from KernelGAN), in
        which case the magnitude bound is raised to 0.1 for stability,
        matching SRRaGAN_model.py:54-56.
        """
        sf = int(conf.scale_factor)
        registry = registry or R.KernelRegistry()
        lower_bound = conf.lower_magnitude_bound
        if isinstance(upscale_kernel, np.ndarray):
            registry.set_estimated(sf, upscale_kernel)
            lower_bound = max(lower_bound, 0.1)
        elif isinstance(upscale_kernel, str) and \
                upscale_kernel.startswith('blurry_cubic_'):
            registry.set_blurry_cubic(
                sf, float(upscale_kernel[len('blurry_cubic_'):]))
        ds_kernel = R.downscale_kernel(sf, registry)
        ds_margin = invalid_margin_size_downscale(
            sf, conf.filter_perturbation_limit, registry)
        inv_hth, inv_margin = compute_inv_hth(
            ds_kernel, sf,
            lower_magnitude_bound=lower_bound,
            desired_energy_portion=conf.desired_inv_hth_energy_portion,
            filter_perturbation_limit=conf.filter_perturbation_limit)
        margins_lr = 2 * ds_margin + inv_margin
        return cls(conf=conf, ds_kernel=ds_kernel, inv_hth=inv_hth,
                   ds_kernel_invalidity_half_size_lr=ds_margin,
                   inv_hth_invalidity_half_size=inv_margin,
                   invalidity_margins_lr=margins_lr,
                   invalidity_margins_hr=sf * margins_lr)

    # ---------------------------------------------------------------- device
    def device_filters(self, channels: int = 3, dtype=jnp.float32,
                       separable: bool = True) -> 'CEMFilters':
        """Build the device filter set.

        With ``separable=True`` (default) each 2-D filter that factors as a
        rank-1 outer product (all of them, for bicubic and for any separable
        estimated kernel) runs as two 1-D depthwise convs — ~k/2x fewer VPU
        ops with results equal up to fp summation order.  Non-separable
        estimated kernels fall back to the 2-D path automatically.
        """
        sf = int(self.conf.scale_factor)
        pre, _post = R.calc_strides((0, 0), sf)

        def build(kernel2d):
            w2d = F.depthwise_weights(kernel2d, channels, dtype)
            if not separable:
                return w2d, None, None
            fac = F.separable_factors(kernel2d)
            if fac is None:
                return w2d, None, None
            col, row = fac
            return (w2d,
                    F.depthwise_weights_1d(col, channels, 0, dtype),
                    F.depthwise_weights_1d(row, channels, 1, dtype))

        w_down, w_down_c, w_down_r = build(np.rot90(self.ds_kernel,
                                                    2).copy())
        w_up, w_up_c, w_up_r = build(self.ds_kernel * sf ** 2)
        w_inv, w_inv_c, w_inv_r = build(self.inv_hth)
        return CEMFilters(
            sf=sf, pre=(int(pre[0]), int(pre[1])),
            w_down=w_down, w_up=w_up, w_inv_hth=w_inv,
            w_down_1d=(w_down_c, w_down_r) if w_down_c is not None
            else None,
            w_up_1d=(w_up_c, w_up_r) if w_up_c is not None else None,
            w_inv_hth_1d=(w_inv_c, w_inv_r) if w_inv_c is not None
            else None,
            sigmoid_range_limit=self.conf.sigmoid_range_limit,
            input_range=self.conf.input_range,
        )

    # ------------------------------------------------------------- host-side
    def loss_mask(self, patch_size: int) -> np.ndarray:
        """[1, patch, patch, 1] mask zeroing the CEM-invalid boundary during
        training (CEMnet.py:75-81)."""
        m = np.zeros((1, patch_size, patch_size, 1), dtype=np.float32)
        t = self.invalidity_margins_hr
        m[:, t:-t, t:-t, :] = 1.0
        assert m.mean() > 0, 'loss mask completely nullifies the patch'
        return m

    def project_2_ortho_2_ns(self, hr: np.ndarray) -> np.ndarray:
        """Project an HR image onto the subspace orthogonal to the null
        space: downscale then DT-satisfying upscale (CEMnet.py:156-160)."""
        sf = int(self.conf.scale_factor)
        lr = R.imresize(hr, 1.0 / sf)
        if lr.ndim < hr.ndim:
            lr = lr.reshape(list(np.array(hr.shape[:2]) // sf) +
                            ([hr.shape[2]] if hr.ndim > 2 else []))
        return self.dt_satisfying_upscale(lr)

    def dt_satisfying_upscale(self, lr: np.ndarray) -> np.ndarray:
        """Upscale an LR image so downsampling reproduces it
        (CEMnet.py:60-64)."""
        sf = int(self.conf.scale_factor)
        margin = (2 * self.inv_hth_invalidity_half_size +
                  self.ds_kernel_invalidity_half_size_lr)
        pad = ((margin, margin), (margin, margin)) + \
            (((0, 0),) if lr.ndim > 2 else ())
        lr_p = np.pad(lr, pad, mode='edge')
        if lr_p.ndim == 2:
            lr_p = lr_p[..., None]
        from scipy.signal import convolve2d
        filtered = np.stack([convolve2d(lr_p[:, :, c], self.inv_hth,
                                        mode='same')
                             for c in range(lr_p.shape[-1])], -1)
        hr = R.imresize(filtered, float(sf))
        m = sf * margin
        return hr[m:-m, m:-m, :]

    def enforce_dt_on_image_pair(self, lr_source: np.ndarray,
                                 hr_input: np.ndarray) -> np.ndarray:
        """Make an arbitrary HR edit consistent with an LR source
        (CEMnet.py:146-154).  ``lr_source`` may be LR- or HR-sized."""
        sf = int(self.conf.scale_factor)
        same = [lr_source.shape[i] == hr_input.shape[i]
                for i in range(lr_source.ndim)]
        lr_scale = [sf * lr_source.shape[i] == hr_input.shape[i]
                    for i in range(lr_source.ndim)]
        assert np.all(np.logical_or(same, lr_scale))
        if len(same) == 2:
            lr_source = lr_source[..., None]
            hr_input = hr_input[..., None]
        if np.any(lr_scale):
            low_freq = self.dt_satisfying_upscale(lr_source)
        else:
            low_freq = self.project_2_ortho_2_ns(lr_source)
        return hr_input - self.project_2_ortho_2_ns(hr_input) + low_freq


@dataclasses.dataclass(frozen=True)
class CEMFilters:
    """Device-resident constant filters; all methods are pure/jittable."""
    sf: int
    pre: tuple[int, int]
    w_down: jnp.ndarray
    w_up: jnp.ndarray
    w_inv_hth: jnp.ndarray
    w_down_1d: tuple[jnp.ndarray, jnp.ndarray] | None = None
    w_up_1d: tuple[jnp.ndarray, jnp.ndarray] | None = None
    w_inv_hth_1d: tuple[jnp.ndarray, jnp.ndarray] | None = None
    sigmoid_range_limit: bool = False
    input_range: tuple[float, float] = (0.0, 1.0)

    def _same(self, x, w2d, w1d):
        if w1d is not None:
            return F.filter_replicate_same_separable(x, *w1d)
        return F.filter_replicate_same(x, w2d)

    def downscale(self, x: jnp.ndarray) -> jnp.ndarray:
        return F.aliased_subsample(self._same(x, self.w_down,
                                              self.w_down_1d),
                                   self.sf, self.pre)

    def upscale(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._same(F.zero_stuff(x, self.sf, self.pre), self.w_up,
                          self.w_up_1d)

    def conv_inv_hth(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._same(x, self.w_inv_hth, self.w_inv_hth_1d)

    def ortho_component(self, lr: jnp.ndarray) -> jnp.ndarray:
        """U (inv_hTh * y): the LR-determined low-frequency component."""
        return self.upscale(self.conv_inv_hth(lr))

    def project_ortho(self, hr: jnp.ndarray) -> jnp.ndarray:
        """Projection of an HR image onto the orthogonal(-to-null) space."""
        return self.ortho_component(self.downscale(hr))

    def ns_component(self, generated: jnp.ndarray) -> jnp.ndarray:
        """Null-space component of a generated HR image."""
        ns = generated - self.project_ortho(generated)
        if self.sigmoid_range_limit:
            lo, hi = self.input_range
            ns = jnp.tanh(ns) * (hi - lo)
        return ns

    def enforce(self, lr: jnp.ndarray, generated: jnp.ndarray,
                decompose: bool = False):
        """The CEM combine: ``ortho(lr) + ns(generated)``
        (CEMnet.py:305-310)."""
        ortho = self.ortho_component(lr)
        ns = self.ns_component(generated)
        if decompose:
            return ortho, ns
        return ortho + ns


def cem_wrap(g_apply: Callable, cem_filters: CEMFilters, upscale: int):
    """Wrap a generator apply-fn in the CEM.

    ``g_apply(params, lr, z_hr)`` consumes the NHWC LR input and the latent
    map in HR-pixel space ([N, H, W, Cz]) or None, returning the HR image.
    (The reference packs Z into extra LR channels only because
    nn.Sequential/DataParallel force a single input tensor — CEMnet.py:287-293;
    here Z is a first-class argument.)

    Returns ``apply(params, lr, z_hr, margins_lr, pre_pad)``; ``pre_pad``
    (static) selects eval-time replicate padding by the invalidity margins
    with output unpadding (CEM_PyTorch.forward, CEMnet.py:283-311,313-315).
    """

    def apply(params, lr: jnp.ndarray, z_hr: jnp.ndarray | None,
              margins_lr: int, pre_pad: bool, decompose: bool = False):
        sf = upscale
        if pre_pad and margins_lr > 0:
            m = margins_lr
            lr_in = F.replicate_pad(lr, m)
            z_in = F.replicate_pad(z_hr, sf * m) if z_hr is not None else None
        else:
            lr_in, z_in = lr, z_hr
        generated = g_apply(params, lr_in, z_in)
        out = cem_filters.enforce(lr_in[..., -3:], generated,
                                  decompose=decompose)
        if pre_pad and margins_lr > 0:
            mh = sf * margins_lr
            if decompose:
                out = tuple(o[:, mh:-mh, mh:-mh, :] for o in out)
            else:
                out = out[:, mh:-mh, mh:-mh, :]
        return out

    return apply


def consistent_downsample(x: jnp.ndarray, cem_filters: CEMFilters,
                          margin_lr: int) -> jnp.ndarray:
    """Downsample HR images with replicate pre-padding to suppress border
    artifacts (CEM_downsampler, CEMnet.py:414-428).  ``margin_lr`` should be
    ``cem.ds_kernel_invalidity_half_size_lr``."""
    sf = cem_filters.sf
    padded = F.replicate_pad(x, sf * margin_lr)
    down = cem_filters.downscale(padded)
    if margin_lr > 0:
        down = down[:, margin_lr:-margin_lr, margin_lr:-margin_lr, :]
    return down
