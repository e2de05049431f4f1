"""KernelGAN — blind downscaling-kernel estimation (Bell-Kligler et al.),
TPU-native.

Reference: codes/KernelGAN/ (~1019 LoC).  Same estimation procedure:
  * deep-linear generator (conv stack [7,5,3,1,1,1], no bias, stride-2 last
    layer) whose composition IS the estimated kernel (networks.py:6-31,
    kernelGAN.py:58-63);
  * spectral-norm patch discriminator with pixelwise L1 GAN loss to 0/1
    maps (networks.py:34-56, loss.py:9-27);
  * regularizers: bicubic-similarity prior, sum-to-1, boundary penalty,
    centralization, sparsity (loss.py:29-101) with the Learner's lambda /
    learning-rate schedule (learner.py:1-42);
  * gradient-magnitude-weighted crop sampling (data.py:7-79);
  * kernel post-processing: negligible-value zeroing + center-of-mass shift,
    and the analytic x4 kernel composition (util.py:123-210,169-183).

TPU-first design: the reference runs 3000 un-jitted G+D steps from Python;
here all crops are pre-sampled on the host (the reference also precomputes
its 3000 crop indices up front) and the ENTIRE estimation is a single
``lax.scan`` over iterations — one compile, one device launch.  The lambda /
LR schedule is re-expressed as functions of the iteration index and a small
carried state (the 'similar-to-bicubic' latch), keeping the loop fully
on-device.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

G_STRUCTURE = (7, 5, 3, 1, 1, 1)   # configs.py:55


@dataclasses.dataclass(frozen=True)
class KernelGANConfig:
    input_crop_size: int = 64
    scale_factor: float = 0.5      # downscaling factor the G imitates
    g_chan: int = 64
    d_chan: int = 64
    g_kernel_size: int = 13
    d_n_layers: int = 7
    d_kernel_size: int = 7
    max_iters: int = 3000
    g_lr: float = 2e-4
    d_lr: float = 2e-4
    beta1: float = 0.5
    n_filtering: int = 40
    # constraint coefficients (kernelGAN.py:10-15) + Learner schedule
    lambda_sum2one: float = 0.5
    lambda_bicubic: float = 5.0
    lambda_boundaries: float = 0.5
    lambda_centralized_end: float = 1.0
    lambda_sparse_end: float = 5.0

    @property
    def inv_scale(self) -> int:
        return int(1 / self.scale_factor)


class KGGenerator(nn.Module):
    """Deep-linear downscaling generator.  Input/output NHWC with C=1
    applied per color channel (the reference folds RGB into the batch)."""
    cfg: KernelGANConfig

    @nn.compact
    def __call__(self, x):
        for i, k in enumerate(G_STRUCTURE):
            stride = self.cfg.inv_scale if i == len(G_STRUCTURE) - 1 else 1
            feats = 1 if i == len(G_STRUCTURE) - 1 else self.cfg.g_chan
            x = nn.Conv(feats, (k, k), strides=(stride, stride),
                        padding='VALID', use_bias=False,
                        kernel_init=nn.initializers.xavier_normal(),
                        name=f'conv{i}')(x)
        return x


class KGDiscriminator(nn.Module):
    """Spectral-norm fully-conv critic with sigmoid map output."""
    cfg: KernelGANConfig

    @nn.compact
    def __call__(self, x, train: bool = True):
        from exsr.models.dncnn import SpectralNormConv
        x = SpectralNormConv(self.cfg.d_chan, self.cfg.d_kernel_size,
                             padding=0, name='first')(x)
        for i in range(1, self.cfg.d_n_layers - 1):
            x = SpectralNormConv(self.cfg.d_chan, 1, padding=0,
                                 name=f'mid{i}')(x)
            x = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        x = SpectralNormConv(1, 1, padding=0, name='final')(x)
        return nn.sigmoid(x)


def generator_kernel(g_params, cfg: KernelGANConfig) -> jnp.ndarray:
    """The kernel the deep-linear G composes to — convolve the layer
    weights with a delta (kernelGAN.py:58-63)."""
    k = jnp.ones((1, 1, 1, 1))
    for i in range(len(G_STRUCTURE)):
        w = g_params['params'][f'conv{i}']['kernel']  # HWIO
        # first conv: pad by (estimated kernel size - 1) so the composition
        # of all layers fits exactly into a g_kernel_size map; later convs
        # compose VALID (torch F.conv2d semantics, correlation)
        if i == 0:
            pad = (cfg.g_kernel_size - 1, cfg.g_kernel_size - 1)
            k = jax.lax.conv_general_dilated(
                k, w, (1, 1), [pad, pad],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        else:
            k = jax.lax.conv_general_dilated(
                k, w, (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return jnp.flip(k[0, :, :, 0], axis=(0, 1))


# 8x8 bicubic stride-2 downscaling kernel (loss.py:33-43, fixed constant).
def _bicubic_k8() -> np.ndarray:
    p = np.array([0.0117187500, 0.0351562500, -0.1132812500, -0.4335937500])
    taps = np.array([p[0], p[1], p[2], p[3], p[3], p[2], p[1], p[0]])
    # the published constant equals outer(t, t) with t the 1D half-pel
    # bicubic taps of magnitude sums below; use the exact reference values
    row = np.array([0.0001373291015625, 0.0004119873046875,
                    -0.0013275146484375, -0.0050811767578125,
                    -0.0050811767578125, -0.0013275146484375,
                    0.0004119873046875, 0.0001373291015625])
    t = np.array([-0.0117187500, -0.0351562500, 0.1132812500,
                  0.4335937500])
    t1 = np.array([t[0], t[1], t[2], t[3], t[3], t[2], t[1], t[0]])
    k = np.outer(t1, t1)
    # verify against the reference's first row to guard the derivation
    assert np.allclose(k[0], row, atol=1e-12), 'bicubic k8 derivation drift'
    return k


BICUBIC_K8 = _bicubic_k8()


def gradient_prob_map(img: np.ndarray, crop_size: int) -> np.ndarray:
    """Probability map over crop centers weighted by gradient magnitude
    (data.py:52-59, util.py create_gradient_map/create_probability_map)."""
    from scipy.ndimage import convolve
    gray = img.mean(-1)
    gx = np.abs(convolve(gray, np.array([[1, -1]]), mode='nearest'))
    gy = np.abs(convolve(gray, np.array([[1], [-1]]), mode='nearest'))
    gmag = (gx + gy)
    # suppress borders where a crop would not fit
    h, w = gmag.shape
    pad = crop_size // 2
    mask = np.zeros_like(gmag)
    mask[pad:h - pad, pad:w - pad] = 1.0
    pm = gmag * mask
    s = pm.sum()
    if s <= 0:
        pm = mask
        s = pm.sum()
    return (pm / s).reshape(-1)


class KernelGAN:
    """Per-image kernel estimation."""

    def __init__(self, cfg: KernelGANConfig = KernelGANConfig(),
                 seed: int = 0):
        self.cfg = cfg
        self.g = KGGenerator(cfg)
        self.d = KGDiscriminator(cfg)
        self.rng = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)

    # ----------------------------------------------------------------- data
    def _sample_crops(self, image: np.ndarray):
        cfg = self.cfg
        g_size = cfg.input_crop_size
        # D input = G output size on a g-crop
        shave = sum(k - 1 for k in G_STRUCTURE)
        d_size = (g_size - shave + cfg.inv_scale - 1) // cfg.inv_scale
        # to make D crops comparable, sample crops of d_size directly
        img_small = image  # D sees real patches from the input image
        pm_g = gradient_prob_map(image, g_size)
        pm_d = gradient_prob_map(image, d_size)
        h, w = image.shape[:2]

        def crops(pm, size, n):
            centers = self._np_rng.choice(len(pm), size=n, p=pm)
            rows = np.minimum(np.maximum(centers // w - size // 2, 0),
                              h - size)
            cols = np.minimum(np.maximum(centers % w - size // 2, 0),
                              w - size)
            rows -= rows % 2
            cols -= cols % 2
            return np.stack([image[r:r + size, c:c + size]
                             for r, c in zip(rows, cols)])

        n = cfg.max_iters
        g_crops = crops(pm_g, g_size, n)
        d_crops = crops(pm_d, d_size, n)
        d_crops = d_crops + self._np_rng.normal(
            0, 1 / 255.0, d_crops.shape)
        return (g_crops.astype(np.float32), d_crops.astype(np.float32),
                d_size)

    # ----------------------------------------------------------------- train
    def estimate(self, image: np.ndarray) -> np.ndarray:
        """Run the full GAN estimation on one [H, W, 3] image in [0, 1];
        returns the post-processed kernel."""
        cfg = self.cfg
        g_crops, d_crops, d_size = self._sample_crops(image)
        # RGB folded into the batch dim (the reference's swap_axis trick):
        # each iteration feeds [3, H, W, 1]
        g_crops_t = g_crops.transpose(0, 3, 1, 2)[..., None]  # [N,3,H,W,1]
        d_crops_t = d_crops.transpose(0, 3, 1, 2)[..., None]

        rng_g, rng_d, rng_n = jax.random.split(self.rng, 3)
        g_vars = self.g.init(rng_g, jnp.zeros(
            (3, cfg.input_crop_size, cfg.input_crop_size, 1)))
        d_vars = dict(self.d.init(rng_d, jnp.zeros(
            (3, d_size, d_size, 1))))
        g_tx = optax.chain(optax.scale_by_adam(b1=cfg.beta1, b2=0.999),
                           optax.scale(-1.0))
        d_tx = optax.chain(optax.scale_by_adam(b1=cfg.beta1, b2=0.999),
                           optax.scale(-1.0))
        penalty_mask = jnp.asarray(self._penalty_mask())
        idx = jnp.arange(cfg.g_kernel_size, dtype=jnp.float32)
        wanted_com = cfg.g_kernel_size // 2 + 0.5 * (
            cfg.inv_scale - cfg.g_kernel_size % 2)
        bic_k = jnp.asarray(BICUBIC_K8, jnp.float32)

        def g_downscale_bicubic(x):
            # stride-inv_scale correlation with the fixed bicubic kernel
            w = bic_k[:, :, None, None]
            return jax.lax.conv_general_dilated(
                x, w, (cfg.inv_scale, cfg.inv_scale), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        def shave_to(a, b_shape):
            dh = (a.shape[1] - b_shape[1]) // 2
            dw = (a.shape[2] - b_shape[2]) // 2
            return a[:, dh:dh + b_shape[1], dw:dw + b_shape[2], :]

        def constraints(g_params, g_in, g_out, lam_bic, lam_cent,
                        lam_sparse):
            k = generator_kernel(g_params, cfg)
            down = g_downscale_bicubic(g_in)
            bic = jnp.mean((g_out - shave_to(down, g_out.shape)) ** 2)
            sum2one = jnp.abs(1.0 - k.sum())
            bound = jnp.abs(k * penalty_mask).mean()
            ksum = k.sum()
            com_r = (k.sum(1) @ idx) / ksum
            com_c = (k.sum(0) @ idx) / ksum
            cent = ((com_r - wanted_com) ** 2
                    + (com_c - wanted_com) ** 2) / 2
            # L0.2 sparsity (loss.py SparsityLoss). The raw |k|**0.2 has
            # d/dk = 0.2*|k|**-0.8*sign(k) = inf*0 = NaN at entries that
            # reach EXACTLY zero — measured on TPU: the 3000-iter
            # estimation NaNs between iters 2000-3000 (after the schedule
            # inserts the sparsity term and entries have been driven to
            # zero; scripts_dev/probe_kg_nan.py). The epsilon bounds the
            # gradient while changing the loss by <1e-2 per entry.
            sparse = jnp.mean((jnp.abs(k) + 1e-12) ** 0.2)
            return (lam_bic * bic + cfg.lambda_sum2one * sum2one
                    + cfg.lambda_boundaries * bound + lam_cent * cent
                    + lam_sparse * sparse), bic

        def schedule(it, similar, lam_bic, lam_cent, lam_sparse, bic_cnt,
                     bic_loss):
            """Learner.update re-expressed on-device (learner.py:20-42)."""
            # bicubic-similarity latch
            hit = bic_loss < 0.4
            bic_cnt = jnp.where(similar, bic_cnt,
                                jnp.where(hit, bic_cnt + 1, 0))
            similar = similar | (hit & (bic_cnt >= 2))
            decay_step = (it % 200 == 0) & similar & (lam_bic > 5e-6)
            lam_bic = jnp.where(decay_step,
                                jnp.maximum(lam_bic / 100.0, 5e-6),
                                lam_bic)
            insert = similar & (lam_bic < 5e-3)
            lam_cent = jnp.where(insert, cfg.lambda_centralized_end,
                                 lam_cent)
            lam_sparse = jnp.where(insert, cfg.lambda_sparse_end,
                                   lam_sparse)
            return similar, lam_bic, lam_cent, lam_sparse, bic_cnt

        def lr_scale(it):
            # /10 every 750 iterations (learner.py:24-28)
            return jnp.power(0.1, (it // 750).astype(jnp.float32))

        def d_apply(d_vars, x):
            out, new = self.d.apply(d_vars, x, train=True,
                                    mutable=['batch_stats', 'spectral'])
            return out, dict(new)

        def step(carry, inputs):
            (g_vars_p, g_opt, d_vars_c, d_opt, it, similar, lam_bic,
             lam_cent, lam_sparse, bic_cnt) = carry
            g_in, d_in = inputs
            lr_fac = lr_scale(it)

            # ---- G step
            def g_loss_fn(gp):
                g_out = self.g.apply(gp, g_in)
                d_pred, _ = d_apply(d_vars_c, g_out)
                gan = jnp.abs(d_pred - 1.0).mean()
                cons, bic = constraints(gp, g_in, g_out, lam_bic, lam_cent,
                                        lam_sparse)
                return gan + cons, bic
            (g_l, bic_loss), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_vars_p)
            upd, g_opt = g_tx.update(g_grads, g_opt, g_vars_p)
            upd = jax.tree.map(lambda u: cfg.g_lr * lr_fac * u, upd)
            g_vars_p = optax.apply_updates(g_vars_p, upd)

            # ---- D step
            g_out = jax.lax.stop_gradient(self.g.apply(g_vars_p, g_in))

            def d_loss_fn(dp):
                dv = dict(d_vars_c, params=dp)
                pred_real, new1 = d_apply(dv, d_in)
                pred_fake, new2 = d_apply(dict(dv, **new1), g_out)
                l = (jnp.abs(pred_fake - 0.0).mean()
                     + jnp.abs(pred_real - 1.0).mean()) * 0.5
                return l, new2
            (d_l, new_cols), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_vars_c['params'])
            updd, d_opt = d_tx.update(d_grads, d_opt, d_vars_c['params'])
            updd = jax.tree.map(lambda u: cfg.d_lr * lr_fac * u, updd)
            d_params = optax.apply_updates(d_vars_c['params'], updd)
            d_vars_c = dict(d_vars_c, params=d_params, **new_cols)

            similar, lam_bic, lam_cent, lam_sparse, bic_cnt = schedule(
                it, similar, lam_bic, lam_cent, lam_sparse, bic_cnt,
                bic_loss)
            return (g_vars_p, g_opt, d_vars_c, d_opt, it + 1, similar,
                    lam_bic, lam_cent, lam_sparse, bic_cnt), \
                (g_l, d_l, bic_loss)

        carry = (g_vars, g_tx.init(g_vars), d_vars,
                 d_tx.init(d_vars['params']), jnp.zeros((), jnp.int32),
                 jnp.zeros((), bool),
                 jnp.asarray(cfg.lambda_bicubic, jnp.float32),
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                 jnp.zeros((), jnp.int32))
        scan = jax.jit(lambda c, xs: jax.lax.scan(step, c, xs))
        carry, losses = scan(carry, (jnp.asarray(g_crops_t),
                                     jnp.asarray(d_crops_t)))
        g_final = carry[0]
        k = np.asarray(generator_kernel(g_final, self.cfg))
        self.losses = tuple(np.asarray(l) for l in losses)
        return post_process_kernel(k, sf=cfg.inv_scale,
                                   n=cfg.n_filtering)

    def _penalty_mask(self) -> np.ndarray:
        """Boundary penalty mask (util.py:146-153)."""
        ks = self.cfg.g_kernel_size
        center = ks // 2 + ks % 2
        z = np.arange(-ks // 2 + 1, ks // 2 + 1)
        g1 = np.exp(-z ** 2 / (2 * ks ** 2)) / np.sqrt(2 * np.pi * ks ** 2)
        mask = np.outer(g1, g1)
        mask = 1 - mask / mask.max()
        margin = (ks - center) // 2 - 1
        if margin > 0:
            mask[margin:-margin, margin:-margin] = 0
        return 30.0 * mask


def zeroize_negligible(k: np.ndarray, n: int) -> np.ndarray:
    """util.py:134-143."""
    k_sorted = np.sort(k.flatten())
    k_n_min = 0.75 * k_sorted[-n - 1]
    filtered = np.clip(k - k_n_min, 0, 100)
    return filtered / filtered.sum()


def kernel_shift(kernel: np.ndarray, sf: int) -> np.ndarray:
    """Center-of-mass shift + sub-pixel alignment (util.py:185-209)."""
    from scipy.ndimage import center_of_mass, shift
    com = np.array(center_of_mass(kernel))
    wanted = np.array(kernel.shape) // 2 + 0.5 * (
        np.array(sf) - (np.array(kernel.shape) % 2))
    vec = wanted - com
    pad = int(np.ceil(np.max(np.abs(vec)))) + 1
    kernel = np.pad(kernel, pad)
    return shift(kernel, vec)


def post_process_kernel(k: np.ndarray, sf: int, n: int = 40) -> np.ndarray:
    """util.py:123-131, plus a final renormalization: the spline shift
    perturbs the sum slightly (measured ~3e-4 on a TPU 3000-iter
    estimate), and the CEM rebuild contract — both exsr's
    ``resize.set_estimated`` and the reference's identical assert
    (imresize_CEM.py:27) — requires sum-to-1 within float32 eps."""
    k = kernel_shift(zeroize_negligible(k, n), sf=sf)
    return k / k.sum()


def aniso_gaussian_kernel(size: int, sig1: float, sig2: float,
                          theta: float, sf: int = 2) -> np.ndarray:
    """Synthetic anisotropic-Gaussian downscale kernel (the degradation
    family the reference trains/validates KernelGAN on, KernelGAN/util.py
    gen_kernel procedure: random sigmas + rotation).  Centered at the
    stride-``sf`` correlation convention that :func:`kernel_shift`
    enforces — COM at ``size//2 + 0.5*(sf - size%2)`` on both axes — so a
    kernel recovered from an image degraded with it is directly
    comparable."""
    c = size // 2 + 0.5 * (sf - size % 2)
    yy, xx = np.mgrid[:size, :size].astype(np.float64)
    d = np.stack([yy - c, xx - c], -1)
    r = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    cov = r @ np.diag([sig1 ** 2, sig2 ** 2]) @ r.T
    icov = np.linalg.inv(cov)
    k = np.exp(-0.5 * np.einsum('hwi,ij,hwj->hw', d, icov, d))
    return k / k.sum()


def kernel_moments(k: np.ndarray):
    """(COM, centered 2x2 covariance) of a kernel — a size/alignment-
    independent summary for comparing a recovered kernel to ground
    truth."""
    k = np.asarray(k, np.float64)
    k = k / k.sum()
    yy, xx = np.mgrid[:k.shape[0], :k.shape[1]].astype(np.float64)
    com = np.array([(k * yy).sum(), (k * xx).sum()])
    dy, dx = yy - com[0], xx - com[1]
    cov = np.array([[(k * dy * dy).sum(), (k * dy * dx).sum()],
                    [(k * dy * dx).sum(), (k * dx * dx).sum()]])
    return com, cov


def analytic_x4_kernel(k: np.ndarray) -> np.ndarray:
    """Compose the x4 kernel from an estimated x2 kernel
    (util.py:169-182)."""
    ks = k.shape[0]
    big = np.zeros((3 * ks - 2, 3 * ks - 2))
    for r in range(ks):
        for c in range(ks):
            big[2 * r:2 * r + ks, 2 * c:2 * c + ks] += k[r, c] * k
    crop = ks // 2
    big = big[crop:-crop, crop:-crop]
    return big / big.sum()
