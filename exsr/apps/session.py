"""Headless interactive edit session — the GUI backend as a library.

The reference couples all editing logic to a PyQt5 GUI (codes/GUI.py, 2691
LoC).  Here the model-facing behavior is a Qt-free API so any frontend
(web, notebook, CLI) is a thin client:

  open_image -> set_region -> optimize(objective, ...) / set_z_from_svd ->
  undo/redo -> save_z/load_z.

Reproduced GUI semantics:
  * local edits crop every tensor to the mask's bounding rectangle
    (+ margins) and merge the optimized Z back (GUI.py:1897-1923,1964-1981,
    2077-2089); crops are bucketed to multiples of 16 LR pixels so repeated
    edits hit the jit cache instead of recompiling;
  * the edit loop runs mini-epochs of 5 iterations inside a wall-clock
    budget (default 30 s), rolls Z back when the loss did not decrease and
    divides the LR by 5 (GUI.py:51-62,2043-2134);
  * Z history/redo stacks (GUI.py:2604-2631); uniform-Z; SVD-domain slider
    control of masked regions (SetZ, GUI.py:2146-2218);
  * HSV/brightness edits via consistency enforcement
    (GUI.py:1552-1585) and scribble desired-image synthesis
    (Z_optimization.py:409-423).
"""
from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from exsr.cem.cem import CEM, CEMConf, cem_wrap, consistent_downsample
from exsr.ops.structure_tensor import svd_to_latent_z
from exsr.utils.compile import tuned_jit
from exsr.zopt import objectives as obj
from exsr.zopt.optimizer import ZOptimizer, atanh_init
from exsr.zopt.histogram import SoftHistogramLoss

DEFAULT_TIME_BUDGET_S = 30.0   # GUI.py:62
ITERS_PER_ROUND = 5            # GUI.py:51
INITIAL_LR = 1e-1              # GUI.py:53
LR_DECAY_ON_PLATEAU = 5.0      # GUI.py:2131-2134
# Edit crops are bucketed so repeated same-ballpark edits reuse compiled
# programs.  8 (vs 16 in round 2) nearly halves the smallest edit's FLOPs
# (window 16 + 2x10 margins = 36 -> crop 40 instead of 48) at twice the
# worst-case number of distinct compile shapes — measured win on the
# overhead-bound small-window edit latency.
CROP_BUCKET_LR = 8


def _bucket(lo: int, hi: int, size: int, bucket: int) -> tuple[int, int]:
    """Expand [lo, hi) to a bucket multiple, clipped to [0, size)."""
    length = hi - lo
    target = min(size, int(np.ceil(length / bucket)) * bucket)
    lo = max(0, min(lo - (target - length) // 2, size - target))
    return lo, lo + target


@dataclasses.dataclass
class EditSession:
    scale: int = 4
    nb: int = 23
    nf: int = 64
    latent_channels: int = 3
    z_range: float = 1.0
    time_budget_s: float = DEFAULT_TIME_BUDGET_S
    edit_dtype: object = None     # e.g. jnp.bfloat16: bf16 trunk for edits
    fast_edit: bool = True        # crop includes the margins; skip pre-pad
    fast_trunk: bool = True       # grouped-conv trunk (rrdb_fast; ~1.5x)
    iters_per_round: int = ITERS_PER_ROUND  # loss-check granularity
    rounds_per_launch: int = 6   # rounds compiled into one device launch;
    # larger chunks amortize the per-launch latency (notable on the tunnel)

    def __post_init__(self):
        self._build_cem(None)
        from exsr.models.rrdb import RRDBNet
        self.generator = RRDBNet(nb=self.nb, nf=self.nf,
                                 upscale=self.scale,
                                 latent_channels=self.latent_channels,
                                 dtype=self.edit_dtype)
        self.params = None
        self._packed = None
        self._build_forward()
        self.lr_image = None       # [1, h, w, 3]
        self.hr_gt = None
        self.cur_z = None          # [1, H, W, C] numpy
        self.region_mask_hr = None  # [H, W] float
        self.sr = None
        self._history: deque = deque(maxlen=100)
        self._redo: deque = deque(maxlen=100)
        self.d_apply = None        # optional critic for 'Adversarial'
        self.vgg_apply = None      # optional feature net for 'VGG'
        # _zopt_cache (set by _build_forward): (objective-kind, shapes) ->
        # ZOptimizer whose data (LR crop, desired, mask) flows through
        # traced obj_args, so repeated same-shape edits skip recompilation

    def _build_cem(self, upscale_kernel):
        self.estimated_kernel = (upscale_kernel
                                 if isinstance(upscale_kernel, np.ndarray)
                                 else None)
        self.cem = CEM.create(CEMConf(scale_factor=self.scale),
                              upscale_kernel=upscale_kernel)
        self.filters = self.cem.device_filters(3)

    def _build_forward(self):
        if self.fast_trunk:
            from exsr.models.rrdb_fast import rrdbnet_apply_fast
            g = self.generator

            def g_apply(p, x, z):
                return rrdbnet_apply_fast(
                    None, x, z, packed=p, nf=g.nf, gc=g.gc,
                    upscale=self.scale,
                    latent_channels=self.latent_channels,
                    dtype=self.edit_dtype)
        else:
            g_apply = lambda p, x, z: self.generator.apply(p, x, z)
        self._wrapped = cem_wrap(g_apply, self.filters,
                                 upscale=self.scale)
        self._fwd = tuned_jit(lambda p, lr, z: jnp.clip(self._wrapped(
            p, lr, z, self.cem.invalidity_margins_lr, pre_pad=True),
            0.0, 1.0))
        # shape-cached jitted forwards for cropped edit windows (an eager
        # 23-block forward is ~1000 op dispatches through the tunnel)
        m = self.cem.invalidity_margins_lr
        self._crop_fwd = {
            True: tuned_jit(lambda p, lr, z: jnp.clip(self._wrapped(
                p, lr, z, m, pre_pad=True), 0.0, 1.0)),
            False: tuned_jit(lambda p, lr, z: jnp.clip(self._wrapped(
                p, lr, z, m, pre_pad=False), 0.0, 1.0))}
        self._zopt_cache = {}

    @property
    def eff_params(self):
        """Params in the layout the forward path consumes (packed grouped
        weights when fast_trunk, the canonical pytree otherwise)."""
        return self._packed if self.fast_trunk else self.params

    def _repack(self):
        if self.fast_trunk and self.params is not None:
            from exsr.models.rrdb_fast import pack_grouped_params
            g = self.generator
            self._packed = pack_grouped_params(
                self.params, nf=g.nf, gc=g.gc,
                latent_channels=self.latent_channels)
        else:
            self._packed = None

    # --------------------------------------------------------------- kernels
    def set_kernel(self, kernel: np.ndarray | str | None):
        """Rebuild the CEM chain for a non-bicubic downscaling kernel — the
        GUI's in-session estimated-kernel toggle (GUI.py:1587-1606; the
        inv_hTh magnitude bound rises to 0.1 for estimated kernels,
        SRRaGAN_model.py:54-56).  ``kernel`` is an estimated ndarray, a
        ``'blurry_cubic_<sigma>'`` string, or None to restore bicubic.
        Filters, jitted forward, and edit-graph caches are rebuilt; the
        SR view recomputes if an image is open."""
        self._build_cem(kernel)
        self._build_forward()
        if self.lr_image is not None:
            if self.hr_gt is not None:
                # HR-sourced sessions re-derive the LR working image so the
                # consistency invariant holds under the new kernel
                lr = consistent_downsample(
                    jnp.asarray(self.hr_gt), self.filters,
                    self.cem.ds_kernel_invalidity_half_size_lr)
                self.lr_image = np.asarray(lr)
            self.recompute()
        return self.sr

    def estimate_kernel(self, max_iters: int = 3000):
        """Run KernelGAN on the current LR image and switch the CEM to the
        estimated kernel (GUI.py:1587-1599 Change_kernel_in_use)."""
        assert self.lr_image is not None, 'open an image first'
        from exsr.kernelgan.kernelgan import (KernelGAN, KernelGANConfig,
                                              analytic_x4_kernel)
        kg = KernelGAN(KernelGANConfig(max_iters=max_iters))
        k2 = kg.estimate(self.lr_image[0])
        kernel = analytic_x4_kernel(k2) if self.scale == 4 else k2
        self.set_kernel(kernel)
        return kernel

    # -------------------------------------------------------------- loading
    def load_params(self, params):
        self.params = params
        self._repack()
        self._zopt_cache.clear()

    def init_random_params(self, seed: int = 0):
        lr = jnp.zeros((1, 16, 16, 3))
        z = jnp.zeros((1, 16 * self.scale, 16 * self.scale,
                       self.latent_channels))
        self.params = self.generator.init(jax.random.PRNGKey(seed), lr, z)
        self._repack()
        self._zopt_cache.clear()

    def attach_esrgan(self, params=None, nb: int | None = None,
                      seed: int = 1):
        """Plain (Z-less, CEM-less) ESRGAN comparison model — the GUI's
        display_ESRGAN slot (GUI.py:2539-2550) runs a pretrained ESRGAN
        with latent_input='None' and CEM_arch=0 directly on the LR image
        for side-by-side display. ``params`` is a converted checkpoint
        pytree (scripts convert_torch_g --latent_channels 0); seeded
        random when None (pipeline checks)."""
        from exsr.models.rrdb import RRDBNet
        nb = self.nb if nb is None else nb
        g = RRDBNet(nb=nb, upscale=self.scale, latent_channels=0)
        if params is None:
            params = g.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 16, 16, 3)), None)
        self._esrgan_fwd = tuned_jit(
            lambda p, x: jnp.clip(g.apply(p, x, None), 0.0, 1.0))
        self._esrgan_params = params
        self._esrgan_cache = None

    def esrgan_sr(self) -> np.ndarray:
        """Comparison SR from the attached plain-ESRGAN model, cached per
        LR image (recomputed only when the working image changes)."""
        assert getattr(self, '_esrgan_params', None) is not None, \
            'attach_esrgan first'
        assert self.lr_image is not None, 'open an image first'
        cache = getattr(self, '_esrgan_cache', None)
        if cache is not None and cache[0] is self.lr_image:
            return cache[1]
        out = np.asarray(self._esrgan_fwd(self._esrgan_params,
                                          jnp.asarray(self.lr_image)))
        self._esrgan_cache = (self.lr_image, out)
        return out

    def open_image(self, image: np.ndarray, is_hr: bool = True):
        """HR input is consistently downsampled to form the LR working image
        (GUI.py:2483-2572)."""
        img = jnp.asarray(image[None].astype(np.float32))
        if is_hr:
            self.hr_gt = np.asarray(img)
            lr = consistent_downsample(
                img, self.filters, self.cem.ds_kernel_invalidity_half_size_lr)
            self.lr_image = np.asarray(lr)
        else:
            self.hr_gt = None
            self.lr_image = np.asarray(img)
        h, w = self.lr_image.shape[1:3]
        self.cur_z = np.zeros((1, h * self.scale, w * self.scale,
                               self.latent_channels), np.float32)
        self.region_mask_hr = np.ones((h * self.scale, w * self.scale),
                                      np.float32)
        self._history.clear()
        self._redo.clear()
        self._alternatives = None   # retained Zs belong to the old image
        self.recompute()
        return self.sr

    def recompute(self):
        self.sr = np.asarray(self._fwd(self.eff_params,
                                       jnp.asarray(self.lr_image),
                                       jnp.asarray(self.cur_z)))
        return self.sr

    # ----------------------------------------------- alternatives (random)
    def _alternative_z(self, i: int) -> np.ndarray:
        alt = getattr(self, '_alternatives', None)
        assert alt is not None and 0 <= i < len(alt['zs']), \
            'no retained alternatives — run optimize with n_alternatives>1'
        z = self.cur_z.copy()
        ys, xs = alt['hr_slice']
        z[:, ys, xs] = alt['zs'][i:i + 1]
        return z

    def alternative_sr(self, i: int) -> np.ndarray:
        """SR output of retained random alternative ``i`` (the reference
        displays the alternative outputs alongside the default for
        browsing, GUI.py:1740-1800)."""
        return np.asarray(self._fwd(self.eff_params,
                                    jnp.asarray(self.lr_image),
                                    jnp.asarray(self._alternative_z(i))))

    def copy_alternative(self, i: int):
        """CopyAlternative2Default (GUI.py:1420): adopt alternative
        ``i``'s Z inside the selected region, keep cur_Z outside."""
        alt_z = self._alternative_z(i)
        self._push_history()
        m = self.region_mask_hr[None, :, :, None].astype(np.float32)
        self.cur_z = alt_z * m + self.cur_z * (1 - m)
        self.recompute()
        return self.sr

    def copy_default_to_alternatives(self):
        """CopyDefault2Alternative (GUI.py:1421,1817): push cur_Z into
        every retained alternative inside the selected region."""
        alt = getattr(self, '_alternatives', None)
        assert alt is not None, \
            'no retained alternatives — run optimize with n_alternatives>1'
        ys, xs = alt['hr_slice']
        m = self.region_mask_hr[ys, xs][None, :, :, None] \
            .astype(np.float32)
        alt['zs'] = alt['zs'] * (1 - m) + self.cur_z[:, ys, xs] * m

    def invert_region(self):
        """Invert_Z_Mask (GUI.py:1424): flip the selected region."""
        self.set_region(1.0 - self.region_mask_hr)

    # ---------------------------------------------------------------- state
    def _push_history(self):
        self._history.append(self.cur_z.copy())
        self._redo.clear()

    def undo(self):
        if self._history:
            self._redo.append(self.cur_z.copy())
            self.cur_z = self._history.pop()
            self.recompute()
        return self.sr

    def redo(self):
        if self._redo:
            self._history.append(self.cur_z.copy())
            self.cur_z = self._redo.pop()
            self.recompute()
        return self.sr

    def set_region(self, mask_hr: np.ndarray):
        assert mask_hr.shape == self.region_mask_hr.shape
        self.region_mask_hr = mask_hr.astype(np.float32)

    def clear_region(self):
        self.region_mask_hr = np.ones_like(self.region_mask_hr)

    def estimate_periodicity(self, origin_yx, points_yx):
        """Autocorrelation-based cycle-length estimation for the periodicity
        tool (GUI.py:482-545, AUTO_CYCLE_LENGTH_4_PERIODICITY).

        For each clicked direction point, the current SR image's gray
        values are sampled bilinearly along origin->point in ~0.1-px steps;
        the mean-subtracted overlap-normalized autocorrelation's first peak
        (value > 1e-3) gives the cycle length, and the direction vector is
        rescaled to it.  Returns the (y, x) periodicity vectors to pass as
        ``data['periodicity_points']`` to :meth:`optimize`.
        """
        from exsr.utils.misc import (bilinear_sample_line,
                                     first_autocorr_peak,
                                     overlap_normalized_autocorr)
        img = np.asarray(self.sr[0]).mean(-1)
        origin = np.asarray(origin_yx, np.float64)
        out = []
        for p in points_yx:
            p = np.asarray(p, np.float64)
            vec = p - origin
            n = int(np.abs(vec).max() / 0.1)
            vals = bilinear_sample_line(img, origin[0], origin[1],
                                        p[0], p[1], n)
            peak = first_autocorr_peak(overlap_normalized_autocorr(vals))
            cur = vec
            if peak is not None:
                length = float(np.linalg.norm(vec))
                cycle = length / n * peak
                cur = vec / length * cycle
            out.append(cur)
        return out

    def set_uniform_z(self, values):
        """Constant Z over the selected region (GUI.py:2158-2191)."""
        self._push_history()
        vals = np.asarray(values, np.float32).reshape(1, 1, 1, -1)
        m = self.region_mask_hr[None, :, :, None]
        self.cur_z = (1 - m) * self.cur_z + m * vals
        return self.recompute()

    def set_z_from_svd(self, lambda0: float, lambda1: float, theta: float):
        """SVD slider semantics over the region (GUI.py:2146-2218)."""
        z = np.asarray(svd_to_latent_z(jnp.asarray(lambda0),
                                       jnp.asarray(lambda1),
                                       jnp.asarray(theta)))
        return self.set_uniform_z(z)

    # ------------------------------------------------------------- cropping
    def _crop_box(self):
        """LR-domain bounding box of the region mask, bucketed."""
        mask = self.region_mask_hr
        if mask.min() >= 1.0:
            return None
        ys, xs = np.nonzero(mask > 0)
        s = self.scale
        m = self.cem.invalidity_margins_lr
        y0, y1 = ys.min() // s - m, ys.max() // s + 1 + m
        x0, x1 = xs.min() // s - m, xs.max() // s + 1 + m
        h, w = self.lr_image.shape[1:3]
        y0, y1 = _bucket(max(0, y0), min(h, y1), h, CROP_BUCKET_LR)
        x0, x1 = _bucket(max(0, x0), min(w, x1), w, CROP_BUCKET_LR)
        return y0, y1, x0, x1

    # ------------------------------------------------------------- optimize
    def optimize(self, objective: str, data: dict | None = None,
                 max_iters: int | None = None,
                 time_budget_s: float | None = None,
                 n_alternatives: int = 1, lr: float = INITIAL_LR):
        """Gradient-based Z edit (GUI.Optimize_Z, GUI.py:1925-2144).

        ``objective`` uses the reference's vocabulary: 'l1', 'scribble',
        'max_STD', 'min_STD', 'STD_increase', 'STD_decrease', 'Mag', 'TV',
        'periodicity', 'periodicity_nonInt', 'hist', 'dict', 'VGG',
        'Adversarial', 'random_l1', 'limited_random_l1', 'desired_SVD',
        optionally prefixed with 'local_'. Distance objectives also accept
        a 'max_' prefix ('max_l1', 'max_VGG', 'max_hist') which maximizes
        the distance instead — the reference's UnDesired_Im eval modes
        (test.py:185-187, Z_optimization.py:733-734).
        """
        assert self.params is not None, 'load or init generator params first'
        assert self.region_mask_hr.sum() > 0, \
            'empty region selection — select a region (or invert back)'
        data = data or {}
        self._push_history()
        box = self._crop_box()
        s = self.scale
        if box is None:
            lr_crop = self.lr_image
            z_full = self.cur_z
            mask_hr = self.region_mask_hr
            hr_slice = (slice(None), slice(None))
        else:
            y0, y1, x0, x1 = box
            lr_crop = self.lr_image[:, y0:y1, x0:x1]
            z_full = self.cur_z[:, y0 * s:y1 * s, x0 * s:x1 * s]
            mask_hr = self.region_mask_hr[y0 * s:y1 * s, x0 * s:x1 * s]
            hr_slice = (slice(y0 * s, y1 * s), slice(x0 * s, x1 * s))

        # crop the data tensors to the same HR window (GUI.py:1964-1981
        # crops LR/HR/Z/masks AND the objective's images)
        data = dict(data)
        for key in ('desired', 'reference_image_min', 'reference_image_max'):
            if key in data and hasattr(data[key], 'ndim'):
                arr = np.asarray(data[key])
                if arr.ndim == 4 and arr.shape[1:3] == \
                        self.region_mask_hr.shape:
                    data[key] = arr[:, hr_slice[0], hr_slice[1]]
        for key in ('scribble_mask',):
            if key in data and np.asarray(data[key]).shape == \
                    self.region_mask_hr.shape:
                data[key] = np.asarray(data[key])[hr_slice[0], hr_slice[1]]

        # alternatives-batch compile bucketing (exsr.utils.serve): pad the
        # candidate batch up to the next fixed bucket — padded rows are
        # extra random candidates that ride nearly free at the dispatch-
        # floor-bound per-step cost, and the few bucket shapes keep the
        # compiled-program cache hot across different request sizes; only
        # the requested count is retained below
        n_req = n_alternatives
        from exsr.utils.serve import alt_bucket
        b = alt_bucket(n_req) if n_req > 1 else n_req
        lr_batch = jnp.asarray(np.repeat(lr_crop, b, axis=0))
        margins = self.cem.invalidity_margins_lr
        # the crop box already includes the invalidity margins; in fast-edit
        # mode skip the eval-time replicate pre-pad (it would pad a second
        # margin, ~2x the pixels through the generator per step)
        use_prepad = not (self.fast_edit and box is not None)

        def forward(z):
            return self._crop_fwd[use_prepad](self.eff_params, lr_batch, z)

        # cached-compile fast path for the plain l1/brightness edit (the
        # GUI's most common loop): LR crop, desired image, and loss mask
        # flow through traced obj_args, so same-shape edits never recompile
        obj_args = None
        name = objective.replace('local_', '')
        cacheable = (name == 'l1' and 'random' not in objective
                     and 'scribble' not in objective)
        if not cacheable:  # only objective builders consume the initial SR
            initial_out = np.asarray(forward(jnp.asarray(
                np.repeat(z_full, b, axis=0))))
        if cacheable:
            obj_args = {
                'lr': lr_batch,
                'desired': jnp.asarray(np.asarray(data['desired'],
                                                  np.float32)),
                'mask': jnp.asarray(mask_hr[None, :, :, None]
                                    .astype(np.float32)),
            }
            key = ('l1', lr_batch.shape, use_prepad, b)
            if key not in self._zopt_cache:
                def forward_a(z, args):
                    return jnp.clip(self._wrapped(
                        self.eff_params, args['lr'], z, margins,
                        pre_pad=use_prepad), 0.0, 1.0)

                def loss_a(out, z, args):
                    m = args['mask']
                    return jnp.abs(out * m - args['desired'] * m).mean()

                self._zopt_cache[key] = ZOptimizer(
                    forward_a, loss_a, lr=lr, z_range=self.z_range)
            zo = self._zopt_cache[key]
            loss_fn = None
        else:
            loss_fn = self._build_objective(objective, data, mask_hr,
                                            initial_out, forward,
                                            z0=jnp.asarray(
                                                np.repeat(z_full, b,
                                                          axis=0)))
            zo = ZOptimizer(forward, loss_fn, lr=lr, z_range=self.z_range)
        # pre-tanh init on the host: tiny arrays, and every eager device op
        # is a tunnel roundtrip (atanh_init is the device-side twin)
        eps = np.finfo(np.float32).eps
        theta0 = np.arctanh(np.clip(
            np.repeat(z_full, b, axis=0) / self.z_range,
            -1 + eps, 1 - eps)).astype(np.float32)
        if b > 1 or 'random' in objective:
            key = jax.random.PRNGKey(int(time.time() * 1e3) % (2 ** 31))
            from exsr.zopt.optimizer import xavier_uniform_like
            rand = np.asarray(xavier_uniform_like(key,
                                                  jnp.asarray(theta0)))
            if b > 1:
                theta0 = np.concatenate([theta0[:1], rand[1:]], axis=0)
            else:
                theta0 = rand
        theta = jnp.asarray(theta0)
        frozen = jnp.asarray(np.repeat(np.arctanh(np.clip(
            z_full / self.z_range, -1 + eps, 1 - eps)).astype(np.float32),
            b, axis=0))
        z_mask = self._z_mask(mask_hr, z_full.shape)

        budget = (self.time_budget_s if time_budget_s is None
                  else time_budget_s)
        deadline = time.time() + budget
        best_loss, best_theta, best_z = np.inf, theta, None
        losses_hist = []
        rounds = 0
        cur_lr = lr
        # the accept/revert + LR/5 round loop (GUI.py:2043-2134) runs
        # INSIDE one compiled nested scan, `rounds_per_launch` rounds per
        # device launch — through the TPU tunnel the per-launch latency
        # (~40 ms) would otherwise dominate 5-iteration rounds
        max_rounds = (None if max_iters is None else
                      int(np.ceil(max_iters / self.iters_per_round)))
        while time.time() < deadline and cur_lr >= 1e-5:
            n_rounds = self.rounds_per_launch
            if max_rounds is not None:
                n_rounds = min(n_rounds, max_rounds - rounds)
                if n_rounds <= 0:
                    break
            z, theta, chunk_best, cur_lr, losses = zo.optimize_rounds(
                theta, n_rounds=n_rounds,
                iters_per_round=self.iters_per_round, lr=cur_lr,
                z_mask=z_mask, frozen_theta=frozen,
                lr_decay=LR_DECAY_ON_PLATEAU, obj_args=obj_args)
            losses = losses[~np.isnan(losses)]
            losses_hist.extend(losses.tolist())
            rounds += int(np.ceil(len(losses) / self.iters_per_round))
            if chunk_best < best_loss:
                best_loss, best_theta, best_z = chunk_best, theta, z
        if best_z is None:   # budget elapsed before any launch
            eff = (z_mask * best_theta + (1 - z_mask) * frozen
                   if z_mask is not None else best_theta)
            best_z = self.z_range * jnp.tanh(eff)
        z_opt = np.asarray(best_z)[:1]
        if n_req > 1:
            # retain the optimized alternatives for browsing and
            # CopyAlternative2Default (the reference keeps random_Zs
            # alongside cur_Z, GUI.py:1420,1740-1800); bucket-pad rows
            # past the requested count are dropped
            self._alternatives = {'zs': np.asarray(best_z)[1:n_req],
                                  'hr_slice': hr_slice}
        new_z = self.cur_z.copy()
        new_z[:, hr_slice[0], hr_slice[1]] = z_opt
        self.cur_z = new_z
        self.recompute()
        return {'sr': self.sr, 'losses': losses_hist,
                'final_loss': best_loss, 'rounds': rounds,
                'n_alternatives': n_req - 1 if n_req > 1 else 0}

    def _z_mask(self, mask_hr, z_shape):
        if mask_hr.min() >= 1.0:
            return None
        return jnp.asarray(mask_hr[None, :, :, None]
                           .astype(np.float32))

    # ------------------------------------------------- objective dispatcher
    def _build_objective(self, objective: str, data: dict, mask_hr,
                         initial_out, forward, z0=None) -> Callable:
        local = 'local' in objective
        mask = mask_hr.astype(np.float32)
        helpers = obj.STDHelpers.create(
            mask, local=local,
            overlap=1.0 if 'STD' in objective else 0.5)
        initial_std = helpers(jnp.asarray(initial_out))
        mask_dev = jnp.asarray(mask)
        constraining = None
        if mask.min() < 1 and 'non_local' in data:
            constraining = obj.non_local_constraint(
                jnp.asarray(initial_out),
                jnp.asarray((mask <= 0).astype(np.float32)),
                weight=data.get('constraint_weight', 0.1))

        name = objective.replace('local_', '')
        # a 'max_' prefix on a distance objective flips the loss sign —
        # the UnDesired_Im / UnDesired_Im_VGG eval modes maximize distance
        # from the desired image (Z_optimization.py:733-734). STD and Mag
        # objectives carry their own min/max semantics and are unaffected.
        negate = (name.startswith('max_') and 'STD' not in name
                  and 'Mag' not in name)
        if negate:
            name = name[len('max_'):]
        if 'scribble' in name:
            desired, l1_mask, tv_masks = self._scribble_targets(
                data, mask, initial_out)
            loss = obj.scribble(desired, l1_mask, tv_masks)
        elif 'l1' in name and 'random' not in name:
            desired = jnp.asarray(data['desired'])
            loss = obj.l1_to_desired(desired, mask_dev)
        elif name in ('max_STD', 'min_STD', 'STD_increase', 'STD_decrease'):
            desired_std = None
            if 'increase' in name or 'decrease' in name:
                inc = data.get('STD_increment')
                if inc is None:
                    f = (obj.STD_CHANGE_FACTOR if 'increase' in name
                         else 1 / obj.STD_CHANGE_FACTOR)
                    desired_std = initial_std * f
                else:
                    desired_std = initial_std + (
                        inc if 'increase' in name else -inc)
            loss = obj.std_objective(helpers, name, desired_std)
        elif 'Mag' in name:
            # patch-magnitude edits are inherently local (the GUI always
            # issues them as local_Mag_*, Z_optimization.py:365-380)
            assert helpers.indices is not None, \
                "Mag objectives require the 'local_' prefix"
            gray = initial_out.mean(axis=-1)[0]
            patches = np.asarray(jnp.take(
                jnp.asarray(gray.reshape(-1)), helpers.indices)).T
            std = np.maximum(patches.std(0, ddof=1, keepdims=True), 1 / 255)
            inc = data['STD_increment'] * (
                1 if 'increase' in name else -1)
            desired = ((patches - patches.mean(0, keepdims=True)) / std
                       * (std + inc) + patches.mean(0, keepdims=True))
            loss = obj.magnitude_objective(jnp.asarray(desired.T),
                                           helpers.indices)
        elif 'periodicity' in name:
            pts = data['periodicity_points']
            desired_std = (initial_std + data['STD_increment']
                           if 'Plus' in name and 'STD_increment' in data
                           else None)
            if 'nonInt' in name:
                grids = obj.periodicity_grids(pts, mask.shape)
                loss = obj.periodicity_nonint_objective(
                    grids, mask_dev, helpers, initial_std, desired_std)
            else:
                loss = obj.periodicity_objective(
                    [np.array(p, int) for p in pts], mask_dev, helpers,
                    initial_std, desired_std)
        elif 'TV' in name:
            loss = obj.tv_objective(helpers, initial_std)
        elif 'hist' in name or 'dict' in name:
            temperature = 5e-4 if 'hist' in name else 1e-3
            if data.get('auto_temperature') and 'hist' in name:
                # gradient-based calibration on a patch_size-3 probe loss
                # at the default 0.05 start (Z_optimization.py:519-536)
                cal = SoftHistogramLoss.create(
                    desired_images=[np.asarray(d)
                                    for d in data['desired']],
                    desired_masks=data.get('desired_masks'),
                    input_mask=mask,
                    patch_size=3 if 'patch' in name else 1,
                    temperature=0.05)
                theta0 = atanh_init(z0, self.z_range)
                temperature = cal.auto_temperature(
                    lambda th: forward(self.z_range * jnp.tanh(th)),
                    theta0)
            shl = SoftHistogramLoss.create(
                desired_images=[np.asarray(d) for d in data['desired']],
                desired_masks=data.get('desired_masks'),
                input_mask=mask,
                patch_size=6 if 'patch' in name else 1,
                temperature=temperature,
                dictionary_not_histogram='dict' in name,
                no_patch_dc='noDC' in name,
                no_patch_std='no_localSTD' in name)
            std_w = 1e4
            if 'localSTD' in name:
                base = shl
                def loss(out, z):
                    return base(out, z) + std_w * (
                        (helpers(out) - initial_std) ** 2).mean()
            else:
                loss = shl
        elif 'desired_SVD' in name:
            loss = obj.desired_svd_objective(
                jnp.asarray(data['reference_image_min']),
                jnp.asarray(data['reference_image_max']),
                jnp.asarray(data['desired_Z'], jnp.float32),
                mask_dev)
        elif name == 'digit':
            classifier = data['classifier_apply']
            ys, xs = np.nonzero(mask > 0)
            bounds = (int(ys.min()), int(xs.min()), int(ys.max()),
                      int(xs.max()))
            loss = obj.digit_objective(
                classifier, bounds, int(data['digit_2_resemble']),
                multiview=tuple(data.get('multiview_classification',
                                         (1, 3))))
        elif 'VGG' in name and 'random' not in name:
            assert self.vgg_apply is not None, 'no feature net attached'
            desired_feat = self.vgg_apply(jnp.asarray(data['desired']))
            loss = obj.vgg_objective(self.vgg_apply, desired_feat)
        elif 'Adversarial' in name:
            assert self.d_apply is not None, 'no critic attached'
            loss = obj.adversarial_objective(self.d_apply)
        elif 'random' in name:
            loss = obj.diversity_objective(
                name, mask_dev if mask.min() < 1 else None,
                helpers=helpers if local else None,
                initial_std=initial_std,
                initial_image=jnp.asarray(initial_out)
                if 'limited' in name else None,
                rmse_weight=data.get('rmse_weight', 0.0),
                feature_fn=self.vgg_apply if 'VGG' in name else None)
        else:
            raise NotImplementedError(objective)
        if negate:
            loss = obj.negated(loss)
        if constraining is not None:
            loss = obj.with_constraint(loss, constraining)
        return loss

    def _scribble_targets(self, data, mask, initial_out):
        """Desired image + masks for scribble/brightness edits
        (Z_optimization.py:409-423)."""
        from exsr.utils.misc import scribble_mask_components
        scribble_mask = data['scribble_mask']
        desired = np.asarray(data['desired']).copy()
        brightness = data.get('brightness_factor', 0.0)
        mult, l1_mask, tv_masks = scribble_mask_components(
            scribble_mask, mask, brightness)
        if brightness:
            # HSV value-channel scaling of the current output
            cur = np.clip(initial_out[0], 0, 1)
            mx = cur.max(-1)
            scaled = cur * (mult[..., None] * mx[..., None]
                            / np.maximum(mx[..., None], 1e-6))
            sel = ((scribble_mask == 2) | (scribble_mask == 3))[..., None]
            desired = np.where(sel, np.clip(scaled, 0, 1)[None], desired)
        return (jnp.asarray(desired), jnp.asarray(l1_mask),
                [jnp.asarray(m) for m in tv_masks])

    # -------------------------------------------------------------- editing
    def find_optimal_imprint_location(self, imprint: np.ndarray,
                                      search_mask: np.ndarray,
                                      n_trials: int = 200,
                                      seed: int = 0):
        """Random coordinate search for the most LR-consistent placement of
        an imprint (FindOptimalImprintingLocation, GUI.py:887-961): sample
        top-left positions inside the search region, score each by the
        LR-consistency error of the composited image over the imprint's
        footprint, return the best position and its score."""
        ih, iw = imprint.shape[:2]
        H, W = self.region_mask_hr.shape
        ys, xs = np.nonzero(search_mask > 0)
        y_lo, y_hi = ys.min(), min(ys.max(), H - ih)
        x_lo, x_hi = xs.min(), min(xs.max(), W - iw)
        assert y_hi >= y_lo and x_hi >= x_lo, 'imprint larger than region'
        rng = np.random.default_rng(seed)
        sr = np.asarray(self.sr[0], np.float64)
        from exsr.ops.resize import imresize
        best = (np.inf, (int(y_lo), int(x_lo)))
        s = self.scale
        for _ in range(n_trials):
            y = int(rng.integers(y_lo, y_hi + 1))
            x = int(rng.integers(x_lo, x_hi + 1))
            composite = sr.copy()
            composite[y:y + ih, x:x + iw] = imprint
            # score only the LR footprint of the imprint (cheap local crop)
            y0, x0 = max(0, y // s - 4), max(0, x // s - 4)
            y1 = min(H // s, (y + ih) // s + 4)
            x1 = min(W // s, (x + iw) // s + 4)
            crop = composite[y0 * s:y1 * s, x0 * s:x1 * s]
            down = imresize(crop, 1.0 / s)
            err = float(np.abs(
                down - self.lr_image[0, y0:y1, x0:x1]).mean())
            if err < best[0]:
                best = (err, (y, x))
        return {'position': best[1], 'consistency_error': best[0]}

    def imprint(self, imprint_rgb: np.ndarray, position: tuple[int, int],
                optimize_iters: int = 25,
                imprint_mask: np.ndarray | None = None):
        """Paste an imprint at an HR position, make it LR-consistent, and
        pull Z toward reproducing it (GUI.py:857-1283 imprinting flow).
        ``imprint_mask`` (0..1, imprint-sized) keeps the current output
        where 0 — the transparent-mask mode of finalize_imprinting
        (GUI.py:1125-1131)."""
        y, x = position
        desired_full = np.asarray(self.sr[0], np.float64).copy()
        # crop to the canvas: an explicit position near the border keeps
        # the visible part of the imprint (the Qt GUI constrains drags to
        # the canvas by construction; the raw API must not shape-error)
        ih = min(imprint_rgb.shape[0], desired_full.shape[0] - y)
        iw = min(imprint_rgb.shape[1], desired_full.shape[1] - x)
        assert ih > 0 and iw > 0, \
            f'imprint position {position} is outside the image'
        patch = np.asarray(imprint_rgb, np.float64)[:ih, :iw]
        if imprint_mask is not None:
            imprint_mask = np.asarray(imprint_mask)[:ih, :iw]
            m = np.asarray(imprint_mask, np.float64)[..., None]
            patch = m * patch + (1 - m) * desired_full[y:y + ih, x:x + iw]
        desired_full[y:y + ih, x:x + iw] = patch
        consistent = self.cem.enforce_dt_on_image_pair(
            self.lr_image[0].astype(np.float64), desired_full)
        mask = np.zeros(self.region_mask_hr.shape, np.float32)
        # transparent pixels stay unconstrained (the reference ANDs the
        # imprint mask with the negated transparency mask, GUI.py:1130)
        mask[y:y + ih, x:x + iw] = (1.0 if imprint_mask is None else
                                    np.asarray(imprint_mask, np.float32))
        self.set_region(mask)
        return self.optimize(
            'l1', data={'desired': np.clip(consistent, 0, 1)[None]
                        .astype(np.float32)},
            max_iters=optimize_iters)

    def enforce_hsv_edit(self, edited_hr: np.ndarray):
        """Make an external HR edit LR-consistent and display it
        (GUI.py:1552-1585 via CEM Enforce_DT_on_Image_Pair)."""
        consistent = self.cem.enforce_dt_on_image_pair(
            self.lr_image[0], edited_hr.astype(np.float64))
        return np.clip(consistent, 0, 1)

    # ---------------------------------------------------------------- state
    def save_z(self, path: str):
        np.savez(path, z=self.cur_z, scale=self.scale)

    def load_z(self, path: str):
        self._push_history()
        data = np.load(path)
        assert int(data['scale']) == self.scale
        self.cur_z = data['z']
        return self.recompute()
