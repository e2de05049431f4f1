"""Differentiable histogram / patch-dictionary loss (KDE), TPU-native.

Reference: SoftHistogramLoss (Z_optimization.py:24-230).  Faithful pieces:
  * bins = linspace centers for plain grayscale histograms, or the desired
    image's own (deduplicated) pixels/patches in KDE/dictionary mode
    (``Desired_Im_2_Bins``, :108-132 — host-side here, once per edit, since
    the pruned bin count is data-dependent);
  * soft counts: exp(-(|x - bin| (+wraparound))^2 / T), averaged over the
    value dimensions, normalized by the desired image's own normalizer, with
    one extra leak bin in KDE mode (:170-209);
  * KL(desired || produced-log-hist) objective (torch KLDivLoss semantics),
    or the -log-mean-exp dictionary distance (:191-199);
  * patch mode (patch_size 6, 50% overlap on the input mask, full-but-one
    overlap on the desired mask) with optional per-patch DC/STD removal
    (:54-69,177-182);
  * binary-search temperature calibration (TemperatureSearch, :134-168);
  * gradient-based auto-temperature (Optimizable_Temperature + the
    automatic_temperature branch, :14-22,211-231,513-536): Adam on
    log-temperature maximizing the norm of dKL/d(pre-tanh Z), here one
    jitted ``lax.scan`` over the double-grad objective.

The sparse patch-extraction matmuls become dense index gathers
(exsr.zopt.patches).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from exsr.zopt.patches import patch_indices_from_mask, gather_patches

SQRT_EPSILON = 1e-7
EXP_POWER = 2


def prune_bins(values: np.ndarray, bin_width: float) -> np.ndarray:
    """Drop near-duplicate columns of [num_dims, N] (all dims closer than
    bin_width/2 to an earlier kept column) — Desired_Im_2_Bins semantics."""
    kept: list[np.ndarray] = []
    out_idx = []
    for i in range(values.shape[1]):
        v = values[:, i]
        dup = False
        if kept:
            arr = np.stack(kept, 1)
            dup = bool(np.any(np.all(np.abs(arr - v[:, None])
                                     < bin_width / 2, axis=0)))
        if not dup:
            kept.append(v)
            out_idx.append(i)
    return values[:, out_idx]


@dataclasses.dataclass
class SoftHistogram:
    """Device-side soft histogram for one configuration."""
    bins: jnp.ndarray          # [num_dims, n_bins]
    bin_width: float
    max_value: float
    temperature: float
    kde: bool
    dictionary: bool
    normalizer: jnp.ndarray | None = None

    def counts(self, values: jnp.ndarray, temperature: float | None = None
               ) -> jnp.ndarray:
        """values [num_dims, N] -> per-bin soft counts [n_bins] (or the
        dictionary distances [N])."""
        t = self.temperature if temperature is None else temperature
        x = values[:, :, None].astype(jnp.float32)
        b = self.bins[:, None, :]
        d = jnp.abs(x - b)
        d = jnp.minimum(d, jnp.abs(x - b - self.max_value))
        d = jnp.minimum(d, jnp.abs(x - b + self.max_value))
        logk = -((d + SQRT_EPSILON) ** EXP_POWER) / t
        logk = logk.mean(axis=0)              # [N, n_bins]
        if self.dictionary:
            return -jnp.log(jnp.exp(logk).mean(axis=1))   # [N]
        return jnp.exp(logk).mean(axis=0)     # [n_bins]

    def histogram(self, values: jnp.ndarray, normalizer=None,
                  temperature=None):
        """Normalized soft histogram [n_bins(+1)]; returns (hist, norm)."""
        n = values.shape[1]
        counts = self.counts(values, temperature)
        if normalizer is None:
            normalizer = counts.sum() / n
        hist = counts / normalizer / n
        if self.kde:  # leak bin for mass outside the sampled bins
            hist = jnp.concatenate(
                [hist, (1.0 - jnp.minimum(1.0, hist.sum()))[None]])
        return hist, normalizer


def kl_div(log_pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.KLDivLoss (reduction='mean') on (log-input, probs)."""
    safe = jnp.where(target > 0, target * (jnp.log(
        jnp.maximum(target, 1e-30)) - log_pred), 0.0)
    return safe.mean()


@dataclasses.dataclass
class SoftHistogramLoss:
    """Builder + callable objective: hist/dict over masked gray images or
    patches."""
    hist: SoftHistogram
    desired_hist: jnp.ndarray | None     # precomputed target histogram
    input_indices: jnp.ndarray | None    # patch gather indices (or None)
    input_mask_flat: jnp.ndarray | None  # [H*W] bool (pixel mode)
    patch_size: int
    no_patch_dc: bool
    no_patch_std: bool
    mean_patches_std: float | None
    desired_vals: jnp.ndarray | None = None  # [num_dims, N] target samples

    @classmethod
    def create(cls, desired_images: list[np.ndarray],
               desired_masks: list[np.ndarray] | None,
               input_mask: np.ndarray,
               bins: int = 256, vmin: float = 0.0, vmax: float = 1.0,
               patch_size: int = 1, temperature: float = 5e-4,
               dictionary_not_histogram: bool = False,
               no_patch_dc: bool = False, no_patch_std: bool = False):
        """Grayscale hist/dict objective from desired image(s) + masks.

        desired/input images are HWC float arrays in [0,1]; grayscale
        conversion is the channel mean (Z_optimization.py:53).
        """
        bin_width = (vmax - vmin) / (bins - 1)
        num_dims = patch_size ** 2
        kde = patch_size > 1
        mean_patches_std = None
        if patch_size > 1:
            overlap = (num_dims - patch_size) / num_dims
            cols = []
            for im, msk in zip(desired_images, desired_masks):
                gray = im.mean(-1)
                idx = patch_indices_from_mask(msk, patch_size,
                                              patches_overlap=overlap)
                cols.append(gray.reshape(-1)[idx.T])   # [k*k, P]
            desired_vals = np.concatenate(cols, 1)
            if no_patch_dc:
                desired_vals = desired_vals - desired_vals.mean(
                    0, keepdims=True)
                if no_patch_std:
                    stds = np.maximum(desired_vals.std(0, ddof=1,
                                                       keepdims=True),
                                      1 / 255)
                    desired_vals = desired_vals / stds
                    mean_patches_std = float(stds.mean())
                    desired_vals = desired_vals * mean_patches_std
            in_idx = patch_indices_from_mask(input_mask, patch_size,
                                             patches_overlap=0.5)
            input_indices = jnp.asarray(in_idx)
            input_mask_flat = None
        else:
            im, msk = desired_images[0], (desired_masks[0]
                                          if desired_masks else None)
            gray = im.mean(-1).reshape(1, -1)
            desired_vals = gray[:, msk.reshape(-1).astype(bool)] \
                if msk is not None else gray
            input_indices = None
            # static integer indices (boolean masking would create dynamic
            # shapes inside the jitted edit loop)
            input_mask_flat = jnp.asarray(
                np.flatnonzero(input_mask.reshape(-1)).astype(np.int32))
        if kde:
            bin_vals = prune_bins(desired_vals, bin_width)
        else:
            bin_vals = np.linspace(vmin, vmax, bins)[None, :]
        hist = SoftHistogram(bins=jnp.asarray(bin_vals, jnp.float32),
                             bin_width=bin_width, max_value=vmax,
                             temperature=temperature, kde=kde,
                             dictionary=dictionary_not_histogram)
        desired_hist = None
        if not dictionary_not_histogram:
            dh, norm = hist.histogram(jnp.asarray(desired_vals))
            hist = dataclasses.replace(hist, normalizer=norm)
            desired_hist = dh
        return cls(hist=hist, desired_hist=desired_hist,
                   input_indices=input_indices,
                   input_mask_flat=input_mask_flat, patch_size=patch_size,
                   no_patch_dc=no_patch_dc, no_patch_std=no_patch_std,
                   mean_patches_std=mean_patches_std,
                   desired_vals=jnp.asarray(desired_vals, jnp.float32))

    def _image_values(self, image: jnp.ndarray) -> jnp.ndarray:
        """One image [H, W, C] -> [num_dims, N] values for the histogram."""
        gray = image.mean(-1)
        if self.patch_size > 1:
            vals = gather_patches(gray, self.input_indices).T  # [k*k, P]
            if self.no_patch_dc:
                vals = vals - vals.mean(0, keepdims=True)
                if self.no_patch_std:
                    vals = vals / jnp.maximum(
                        vals.std(0, ddof=1, keepdims=True), 1 / 255) \
                        * self.mean_patches_std
            return vals
        flat = gray.reshape(-1)
        if self.input_mask_flat is not None:
            flat = jnp.take(flat, self.input_mask_flat)
        return flat[None, :]

    def __call__(self, out: jnp.ndarray, z=None) -> jnp.ndarray:
        losses = []
        for i in range(out.shape[0]):
            vals = self._image_values(out[i])
            if self.hist.dictionary:
                losses.append(self.hist.counts(vals).mean())
            else:
                h, _ = self.hist.histogram(vals,
                                           normalizer=self.hist.normalizer)
                losses.append(kl_div(jnp.log(h + jnp.finfo(h.dtype).eps),
                                     self.desired_hist))
        return jnp.stack(losses).mean()

    def calibrate_temperature(self, initial_image: jnp.ndarray,
                              desired_kl: float = 1.0,
                              tolerance: float = 0.1) -> float:
        """Binary-search the temperature for a target initial KL divergence
        (TemperatureSearch, Z_optimization.py:134-168)."""
        assert not self.hist.dictionary
        lo, hi = 0.1, 1.0
        within = False
        first_too_big = None
        for _ in range(60):
            t = float(np.exp((lo + hi) / 2))
            if not np.isfinite(t) or t == 0:
                break
            # the reference recomputes the DESIRED histogram (and its
            # normalizer) at every candidate temperature
            # (TemperatureSearch, Z_optimization.py:147-148)
            dh, norm = self.hist.histogram(self.desired_vals,
                                           temperature=t)
            vals = self._image_values(initial_image)
            h, _ = self.hist.histogram(vals, norm, temperature=t)
            kl = float(kl_div(jnp.log(h + 1e-12), dh))
            too_big = kl > desired_kl
            if kl > 0 and abs(np.log(kl / desired_kl)) <= np.log(
                    1 + tolerance):
                return t
            if not within:
                if first_too_big is None:
                    first_too_big = too_big
                else:
                    within = first_too_big != too_big
                if not within:
                    if too_big:
                        hi += 10
                    else:
                        lo -= 10
            if within:
                if too_big:
                    lo = np.log(t)
                else:
                    hi = np.log(t)
        return float(self.hist.temperature)

    def auto_temperature(self, image_of_theta, theta0: jnp.ndarray,
                         n_iters: int = 50, lr: float = 0.5) -> float:
        """Gradient-based temperature calibration (Optimizable_Temperature
        + the automatic_temperature branches, Z_optimization.py:14-22,
        211-231,513-536).

        Maximizes ``||d KL(hist(G(theta)), hist(desired)) / d theta||_2``
        over log-temperature with Adam (lr 0.5, 50 iters), both histograms
        recomputed at the candidate temperature; returns the temperature
        that attained the largest gradient along the trajectory
        (:535-536).  ``image_of_theta`` maps pre-tanh Z to the clipped HR
        output batch; the whole search is one ``lax.scan`` over a
        grad-of-grad objective — a single compiled device program instead
        of the reference's 50 Python-level backward passes.
        """
        assert not self.hist.dictionary, 'unsupported for dictionary'
        import optax

        def neg_grad_norm(log_t):
            t = jnp.exp(log_t)
            dh, norm = self.hist.histogram(self.desired_vals,
                                           temperature=t)

            def kl_of(theta):
                out = image_of_theta(theta)
                losses = []
                for i in range(out.shape[0]):
                    vals = self._image_values(out[i])
                    h, _ = self.hist.histogram(vals, norm, temperature=t)
                    losses.append(kl_div(
                        jnp.log(h + jnp.finfo(h.dtype).eps), dh))
                return jnp.stack(losses).mean()

            g = jax.grad(kl_of)(theta0)
            return -jnp.sqrt((g.astype(jnp.float32) ** 2).sum())

        tx = optax.adam(lr)
        log_t0 = jnp.asarray(np.log(self.hist.temperature), jnp.float32)

        def step(carry, _):
            log_t, opt, best_val, best_log_t = carry
            val, g = jax.value_and_grad(neg_grad_norm)(log_t)
            better = val < best_val
            best_val = jnp.where(better, val, best_val)
            best_log_t = jnp.where(better, log_t, best_log_t)
            upd, opt = tx.update(g, opt)
            return (optax.apply_updates(log_t, upd), opt, best_val,
                    best_log_t), None

        carry0 = (log_t0, tx.init(log_t0), jnp.asarray(jnp.inf, jnp.float32),
                  log_t0)
        (_, _, _, best_log_t), _ = jax.lax.scan(step, carry0, None,
                                                length=n_iters)
        return float(np.exp(best_log_t))
