"""Objective library for Z-space editing — pure jittable loss functions.

Each builder returns ``loss_fn(out, z) -> scalar`` where ``out`` is the
model output batch [B, H, W, C] in [0, 1].  Builders close over device
constants (masks, desired images, patch indices) prepared once per edit.

Reference semantics: Z_optimization.py:328-814 (objective wiring in the
Z_optimizer ctor and loss evaluation in optimize()).  The reference's
~15 objective strings map to these builders; string parsing compatibility
lives in :func:`build_objective`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from exsr.zopt.patches import (patch_indices_from_mask, masked_patch_std)

PATCH_SIZE_4_STD = 7     # Z_optimization.py:330
STD_CHANGE_FACTOR = 1.05


def tv_loss(image: jnp.ndarray) -> jnp.ndarray:
    """Per-image anisotropic TV [B] (Z_optimization.py:324-326)."""
    dx = jnp.abs(image[:, :, :-1, :] - image[:, :, 1:, :]).mean(
        axis=(1, 2, 3))
    dy = jnp.abs(image[:, :-1, :, :] - image[:, 1:, :, :]).mean(
        axis=(1, 2, 3))
    return dx + dy


def translated(image: jnp.ndarray, point: np.ndarray) -> jnp.ndarray:
    """Crop so the result is the image translated by (dy, dx)
    (utils/util.py:260-273); NHWC."""
    dy, dx = int(point[0]), int(point[1])
    ys = slice(dy if dy > 0 else None, dy if dy < 0 else None)
    xs = slice(dx if dx > 0 else None, dx if dx < 0 else None)
    return image[:, ys, xs, :]


@dataclasses.dataclass
class STDHelpers:
    """Masked-STD machinery shared by several objectives."""
    image_mask: jnp.ndarray | None        # [H, W]
    local: bool
    indices: jnp.ndarray | None = None    # [P, k*k]
    non_covered: jnp.ndarray | None = None

    @classmethod
    def create(cls, image_mask: np.ndarray | None, local: bool,
               overlap: float = 1.0) -> 'STDHelpers':
        if not local or image_mask is None:
            return cls(jnp.asarray(image_mask) if image_mask is not None
                       else None, local=False)
        idx, non_cov = patch_indices_from_mask(
            image_mask, PATCH_SIZE_4_STD, patches_overlap=overlap,
            return_non_covered=True)
        return cls(jnp.asarray(image_mask), True, jnp.asarray(idx),
                   jnp.asarray(non_cov) if non_cov is not None else None)

    def __call__(self, out: jnp.ndarray) -> jnp.ndarray:
        """[B, num_stats]: per-image masked STDs
        (Masked_STD, Z_optimization.py:616-627)."""
        if self.local:
            gray = out.mean(axis=-1)  # [B, H, W]
            return jax.vmap(
                lambda g: masked_patch_std(g, self.indices,
                                           self.non_covered))(gray)
        masked = out * self.image_mask[None, :, :, None] \
            if self.image_mask is not None else out
        return jnp.std(masked.reshape(out.shape[0], -1), axis=1,
                       ddof=1)[:, None]


def negated(loss):
    """Sign-flipped objective — the 'max_' distance modes maximize the
    wrapped distance (UnDesired_Im; Z_optimization.py:733-734)."""
    def f(out, z):
        return -loss(out, z)
    return f


def l1_to_desired(desired: jnp.ndarray, loss_mask: jnp.ndarray | None):
    """'l1' objective: masked L1 to a desired image
    (Z_optimization.py:401-448,702-703)."""
    def loss_fn(out, z):
        if loss_mask is None:
            return jnp.abs(out - desired).mean()
        m = loss_mask[None, :, :, None]
        return jnp.abs(out * m - desired * m).mean()
    return loss_fn


def scribble(desired: jnp.ndarray, l1_mask: jnp.ndarray,
             tv_masks: list[jnp.ndarray]):
    """'scribble': L1 on drawn strokes + 8-neighbor local TV per region id
    (Scribble_Loss/Scribble_TV_Loss, Z_optimization.py:424-444)."""
    points = [np.array(p) for p in
              [(-1, -1), (-1, 0), (0, -1), (1, -1)]]

    def loss_fn(out, z):
        m = l1_mask[None, :, :, None]
        loss = jnp.abs(out * m - desired * m).mean()
        for tvm in tv_masks:
            tvm4 = tvm[None, :, :, None]
            for p in points:
                cur_mask = translated(tvm4, p) * translated(tvm4, -p)
                diff = translated(out, p) - translated(out, -p)
                loss = loss + (cur_mask * jnp.abs(diff)).mean()
        return loss
    return loss_fn


def std_objective(helpers: STDHelpers, mode: str,
                  desired_std: jnp.ndarray | None = None):
    """'max_STD' / 'min_STD' / 'STD_increase' / 'STD_decrease'
    (Z_optimization.py:459-469,712-716)."""
    def loss_fn(out, z):
        stds = helpers(out)
        if mode in ('STD_increase', 'STD_decrease'):
            loss = ((stds - desired_std) ** 2).mean()
        else:
            loss = stds.mean()
        return -loss if mode == 'max_STD' else loss
    return loss_fn


def magnitude_objective(desired_patches: jnp.ndarray,
                        indices: jnp.ndarray):
    """'Mag': match patches to STD-modified versions of the initial patches
    (Z_optimization.py:450-455,717-722)."""
    def loss_fn(out, z):
        gray = out.mean(axis=-1)
        def per_im(g):
            patches = jnp.take(g.reshape(-1), indices)  # [P, k*k]
            return ((patches - desired_patches) ** 2).mean()
        return jax.vmap(per_im)(gray).mean()
    return loss_fn


def tv_objective(helpers: STDHelpers, initial_std: jnp.ndarray,
                 std_weight: float = 100.0):
    """'TV': minimize masked TV while preserving the initial STD
    (Z_optimization.py:508-509,727-728)."""
    mask = helpers.image_mask

    def loss_fn(out, z):
        std_term = std_weight * ((helpers(out) - initial_std) ** 2).mean()
        return std_term + tv_loss(out * mask[None, :, :, None]).mean()
    return loss_fn


def periodicity_objective(points: list[np.ndarray], image_mask: jnp.ndarray,
                          helpers: STDHelpers,
                          initial_std: jnp.ndarray | None,
                          desired_std: jnp.ndarray | None = None,
                          std_weight: float = 20.0):
    """'periodicity' (integer translations): images should repeat at the
    given period vectors inside the mask (Z_optimization.py:799-814);
    'Plus' variant targets an increased STD instead of the initial one."""
    mask4 = image_mask[None, :, :, None]
    target_std = desired_std if desired_std is not None else initial_std

    def loss_fn(out, z):
        loss = std_weight * ((helpers(out) - target_std) ** 2).mean()
        for p in points:
            cur_mask = translated(mask4, p) * translated(mask4, -p)
            diff = translated(out, p) - translated(out, -p)
            loss = loss + (cur_mask * jnp.abs(diff)).mean()
        return loss
    return loss_fn


def periodicity_grids(points, image_size):
    """Sampling grids for non-integer periods (Z_optimization.py:474-502):
    per period vector, two pixel-coordinate grids (+p/2 and -p/2 shifted
    crops realized by interpolation)."""
    grids = []
    h, w = image_size
    for point in points:
        pair = []
        for sign in (1, -1):
            cur = sign * np.asarray(point, dtype=np.float64)
            rngs = []
            for axis, size in ((0, h), (1, w)):
                t = cur[axis]
                lo = t if t > 0 else 0
                hi = size + t if t < 0 else size
                num = size - int(np.ceil(max(abs(0 - lo), abs(size - hi))))
                rngs.append(np.linspace(lo, hi, num))
            yy, xx = np.meshgrid(rngs[0], rngs[1], indexing='ij')
            pair.append((jnp.asarray(yy), jnp.asarray(xx)))
        grids.append(pair)
    return grids


def periodicity_nonint_objective(grids, image_mask: jnp.ndarray,
                                 helpers: STDHelpers,
                                 initial_std: jnp.ndarray | None,
                                 desired_std: jnp.ndarray | None = None,
                                 std_weight: float = 20.0):
    """Non-integer periodicity via bilinear resampling (map_coordinates),
    the TPU-native analogue of the reference's grid_sample
    (Z_optimization.py:804-810)."""
    target_std = desired_std if desired_std is not None else initial_std

    def sample(img2d, yy, xx):
        return jax.scipy.ndimage.map_coordinates(img2d, [yy, xx], order=1,
                                                 mode='nearest')

    def loss_fn(out, z):
        loss = std_weight * ((helpers(out) - target_std) ** 2).mean()
        gray_mask = image_mask
        for (yy0, xx0), (yy1, xx1) in grids:
            m0 = sample(gray_mask, yy0, xx0)
            m1 = sample(gray_mask, yy1, xx1)
            # crops may differ by a pixel; align to the common size
            hh = min(m0.shape[0], m1.shape[0])
            ww = min(m0.shape[1], m1.shape[1])
            cur_mask = m0[:hh, :ww] * m1[:hh, :ww]

            def chan_diff(img):  # img [H, W]
                a = sample(img, yy0, xx0)[:hh, :ww]
                b = sample(img, yy1, xx1)[:hh, :ww]
                return jnp.abs(a - b)

            diffs = jax.vmap(jax.vmap(chan_diff, in_axes=-1, out_axes=-1))(
                out)
            loss = loss + (cur_mask[None, :, :, None] * diffs).mean()
        return loss
    return loss_fn


def vgg_objective(vgg_apply: Callable, desired_features: jnp.ndarray):
    """'VGG': L1 feature match to a desired image
    (Z_optimization.py:505-507,729-730)."""
    def loss_fn(out, z):
        return jnp.abs(vgg_apply(out) - desired_features).mean()
    return loss_fn


def adversarial_objective(d_apply: Callable):
    """'Adversarial': fool the critic (wgan-style −mean(D)) —
    Z_optimization.py:543-545,710-711."""
    def loss_fn(out, z):
        return -d_apply(out).mean()
    return loss_fn


def diversity_objective(mode: str, image_mask: jnp.ndarray | None,
                        helpers: STDHelpers | None = None,
                        initial_std: jnp.ndarray | None = None,
                        initial_image: jnp.ndarray | None = None,
                        rmse_weight: float = 0.0,
                        feature_fn: Callable | None = None,
                        std_weight: float = 1e3):
    """'random_l1' / 'random_VGG' (+'limited'): maximize the minimal pairwise
    distance across the batch of alternatives (Z_optimization.py:683-701);
    'limited' subtracts an RMSE leash to the current image (:690-694)."""
    use_vgg = feature_fn is not None

    def loss_fn(out, z):
        data = feature_fn(out) if use_vgg else out
        diffs = jnp.abs(data[None] - data[:, None])          # [B,B,...]
        eye = jnp.eye(data.shape[0])
        eye = eye.reshape(eye.shape + (1,) * (diffs.ndim - 2))
        z_loss = jnp.min(diffs + eye, axis=0)                # [B, ...]
        if 'limited' in mode and initial_image is not None:
            rmse = jnp.abs(data - initial_image)
            z_loss = z_loss - rmse_weight * rmse
        if image_mask is not None and not use_vgg:
            z_loss = z_loss * image_mask[None, :, :, None]
        loss = -jnp.mean(z_loss)
        if 'local' in mode and helpers is not None:
            loss = loss + std_weight * (
                (helpers(out) - initial_std) ** 2).mean()
        return loss
    return loss_fn


def brightness_objective(desired: jnp.ndarray, loss_mask: jnp.ndarray):
    """Brightness edit: the GUI precomputes an HSV-V-multiplied desired image
    and reuses the l1 objective (Z_optimization.py:409-423); provided as an
    alias for API parity."""
    return l1_to_desired(desired, loss_mask)


def desired_svd_objective(reference_min: jnp.ndarray,
                          reference_max: jnp.ndarray,
                          target_z3: jnp.ndarray,
                          image_mask: jnp.ndarray,
                          noise_std: float = 1.0 / 255.0):
    """'desired_SVD': drive the masked structure-tensor statistics toward
    the Z the SVD sliders encode — FilterLoss in constant-Z mode
    (loss.py:69-83,171-192; wired by Z_optimization.py:456-458,704-705).

    ``reference_min``/``reference_max`` are the model outputs at Z=-1 and
    Z=+1 over the same region (GUI passes them so the slider range maps to
    the model's actually attainable statistic range).
    """
    from exsr.ops.structure_tensor import image_gradients
    mask = image_mask[:-1, :-1]  # gradient maps lose one row/col
    msum = mask.sum()

    def masked_moments(img4):
        ix, iy = image_gradients(img4)
        mom = jnp.stack([ix * ix, iy * iy, ix * iy], 0)  # [3,B,H-1,W-1,C]
        mom = mom.mean(axis=-1)                           # channel mean
        return (mom * mask[None, None]).sum(axis=(2, 3)) / msum  # [3, B]

    ref_min = masked_moments(reference_min)[:, 0]
    ref_max = masked_moments(reference_max)[:, 0]
    normalizer = jnp.sqrt(jnp.prod(
        (ref_min[:2] + ref_max[:2]) / 2.0)) + noise_std
    ref_min = ref_min / normalizer
    ref_max = ref_max / normalizer
    tz = target_z3.reshape(-1)

    def loss_fn(out, z):
        measured = masked_moments(out) / normalizer      # [3, B]
        target = tz / 2.0 * (ref_max - ref_min) + (ref_max + ref_min) / 2.0
        return jnp.abs(measured - target[:, None]).mean()
    return loss_fn


def digit_views_transform(mask_bounds: tuple,
                          multiview: tuple[int, int] = (1, 3),
                          classifier_size: int = 54) -> Callable:
    """Multi-view crop/zoom/translate transform feeding the SVHN
    classifier (Z_optimization.py:551-601): crop to the mask bounds,
    build zoom/translation views resized to the classifier input,
    normalized to [-1, 1].  View geometry is fixed per edit (host-side),
    so the result stays static-shape."""
    y0, x0, y1, x1 = mask_bounds
    ch, cw = y1 - y0 + 1, x1 - x0 + 1
    n_zoom, n_trans = multiview
    if n_trans % 2 == 0:
        n_trans += 1
    views = []
    seen = set()
    for extra_zoom in range(n_zoom + 1):
        rf = (classifier_size - extra_zoom) / ch
        rw = int(np.round(rf * cw))
        req = classifier_size - rw
        for left in np.linspace(0, req, n_trans + 2)[1:-1]:
            pad_l = int(np.round(left))
            pad_t = int(np.round(np.ceil(extra_zoom / 2)))
            key = (pad_l, pad_t, rf)
            if key in seen:
                continue
            seen.add(key)
            views.append((rf, pad_l, req - pad_l, pad_t,
                          extra_zoom - pad_t))

    def transform(out):
        crop = out[:, y0:y1 + 1, x0:x1 + 1, :]
        stacked = []
        for rf, pl_, pr_, pt_, pb_ in views:
            rh = int(np.round(rf * ch))
            rw = int(np.round(rf * cw))
            v = jax.image.resize(crop, (crop.shape[0], rh, rw, 3),
                                 method='bilinear')
            v = jnp.pad(v, ((0, 0), (pt_, pb_), (pl_, pr_), (0, 0)),
                        mode='edge')
            stacked.append(v)
        return (jnp.concatenate(stacked, 0) - 0.5) / 0.5
    return transform


def digit_score(classifier_apply: Callable, transform: Callable,
                out, digit: int) -> tuple[float, float]:
    """Post-optimization digit reading (Z_optimization.py:782-786):
    returns ``(num_digits, prob)`` — the argmax of the mean length-head
    logits and the mean softmax probability of ``digit`` over the views.
    """
    heads = classifier_apply(transform(jnp.asarray(out)))
    length_logits, d1 = heads[0], heads[1]
    num = int(jnp.argmax(length_logits.mean(0)))
    prob = float(jax.nn.softmax(d1, axis=-1)[:, digit].mean())
    return num, prob


def digit_objective_traced(classifier_apply: Callable,
                           transform: Callable):
    """``digit_objective`` with the target label flowing as a traced
    obj_arg (``args['digit']``) so one compile serves all 10 digits of
    the Auto_Explore_Digits loop (GUI.py:1517-1539)."""
    import optax

    def loss_fn(out, z, args):
        heads = classifier_apply(transform(out))
        length_logits, d1 = heads[0], heads[1]
        n = d1.shape[0]
        lbl = jnp.full((n,), args['digit'], jnp.int32)
        digit_loss = optax.softmax_cross_entropy_with_integer_labels(
            d1, lbl).mean()
        length_loss = optax.softmax_cross_entropy_with_integer_labels(
            length_logits, jnp.ones((n,), jnp.int32)).mean()
        return digit_loss + length_loss
    return loss_fn


def digit_objective(classifier_apply: Callable, mask_bounds: tuple,
                    digit: int, multiview: tuple[int, int] = (1, 3),
                    classifier_size: int = 54):
    """'digit': make the masked region classify as a given SVHN digit
    (Z_optimization.py:551-601): minimize cross-entropy of
    (digit, length==1) over the views of ``digit_views_transform``.

    ``classifier_apply(x) -> (length_logits, d1, d2, d3, d4, d5)`` with x
    in [-1, 1].
    """
    import optax
    transform = digit_views_transform(mask_bounds, multiview,
                                      classifier_size)

    def loss_fn(out, z):
        heads = classifier_apply(transform(out))
        length_logits, d1 = heads[0], heads[1]
        n = d1.shape[0]
        digit_loss = optax.softmax_cross_entropy_with_integer_labels(
            d1, jnp.full((n,), digit, jnp.int32)).mean()
        length_loss = optax.softmax_cross_entropy_with_integer_labels(
            length_logits, jnp.ones((n,), jnp.int32)).mean()
        return digit_loss + length_loss
    return loss_fn


def non_local_constraint(initial_output: jnp.ndarray,
                         constraining_mask: jnp.ndarray, weight: float):
    """Penalty holding the image fixed outside the edit mask
    (Z_optimization.py:386-390)."""
    m = constraining_mask[None, :, :, None]

    def penalty(out):
        return weight * jnp.abs(out * m - initial_output * m).mean()
    return penalty


def with_constraint(loss_fn: Callable, penalty: Callable):
    def wrapped(out, z):
        return loss_fn(out, z) + penalty(out)
    return wrapped
