"""Explorable-SR GAN trainer — pjit-compiled G/D steps + host controller.

Re-design of the reference's SRRaGANModel training engine
(SRRaGAN_model.py:22-521): the *math* of each gradient step is reproduced
inside two compiled functions (``d_step``, ``g_step``) that shard the batch
over the mesh's 'data' axis, while the *control flow* the reference
interleaves with compute — D-verification gating, adaptive G/D update
ratios, LR rollback — lives in a small host-side
:class:`~exsr.train.controller.GANController` consuming per-step scalars.

Faithful step semantics:
  * Z sampling per batch: spatially-uniform U[-1,1] scalars per channel when
    the latent loss is active; SVD-mode sampling maps (lambda-ratios, theta)
    through ``svd_to_latent_z`` (feed_data, SRRaGAN_model.py:244-278);
  * dual G step once the generator has started learning: a MAP step on the
    Z* from 10 inner Adam-on-Z iterations against L1-to-GT (the reference's
    in-training Z_optimizer, :109-123,314-327) plus a static-Z step;
  * losses: range (w=5000), L_struct latent loss on the static step (w=1),
    optimal-Z MAP L1 (w=100), adversarial (w=1, wgan-gp, gp_w=10), with the
    reference's dual-step/accumulation normalizations (:416-480);
  * D: non-relativistic doubles each term (:356-358), real pass on the first
    dual step only, fake passes on both, GP per dual step (:336-400);
  * all losses computed on CEM-margin-unpadded crops (:319-333).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from exsr.utils.compile import tuned_jit

from exsr.losses import losses as L
from exsr.losses.filter_loss import (FilterLossConfig, RatioStats,
                                     filter_loss, num_latent_channels)
from exsr.ops.structure_tensor import svd_to_latent_z
from exsr.parallel.mesh import ShardingRules


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors options/train/train_explorable_SR.json."""
    scale: int = 4
    patch_size: int = 208
    lr_g: float = 1e-5
    lr_d: float = 1e-5
    beta1_g: float = 0.9
    beta2_g: float = 0.999
    beta1_d: float = 0.9
    beta2_d: float = 0.999
    lr_steps: tuple[int, ...] = (50_000, 100_000, 200_000, 300_000)
    lr_gamma: float = 0.5
    gan_type: str = 'wgan-gp'
    gan_weight: float = 1.0
    gp_weight: float = 10.0
    range_weight: float | None = 5000.0
    latent_weight: float | None = 1.0
    pixel_weight: float | None = None
    feature_weight: float | None = None
    optimal_z_weight: float | None = 100.0
    optimal_z_iters: int = 10
    optimal_z_lr: float = 1.0
    latent_channels: str = 'SVDinNormedOut_structure_tensor'
    relativistic: bool = False
    add_quantization_noise: bool = False
    hinge_threshold: float | None = None
    d_update_ratio: int = 10
    d_valid_steps_4_g_update: int = 10
    min_d_prob_ratio_4_g: float = 1.05
    min_mean_d_correct: float = 0.9
    d_init_iters: int = 0
    steps_4_loss_std: int = 500
    std_4_lr_drop: float | None = 1e6
    niter: int = 510_000
    input_range: tuple[float, float] = (0.0, 1.0)
    # Virtual-batch gradient accumulation (options.py:134-157,
    # SRRaGAN_model.py:280-521): the step receives the full virtual batch
    # and scans over `grad_accum_*` microbatches, averaging gradients
    # before the single optimizer update.
    grad_accum_g: int = 1
    grad_accum_d: int = 1
    # Feed the D the CEM (low-freq, high-freq) pair instead of the summed
    # image (SRRaGAN_model.py:84,349-369; network_D.decomposed_input).  The
    # reference ships this off ("(unsupported)", train_explorable_SR.json:58)
    # but the path exists; requires a pair-input D (PatchGANDiscriminator
    # with decomposed_input=True) and a ``g_apply_decomp``.
    decomposed_d: bool = False

    @property
    def num_latent_channels(self) -> int:
        return num_latent_channels(self.latent_channels)

    @property
    def svd_mode(self) -> bool:
        return self.latent_channels in ('SVD_structure_tensor',
                                        'SVDinNormedOut_structure_tensor')


class GTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    d_vars: Any          # {'params', 'batch_stats'?}
    d_opt: Any
    ratio_stats: RatioStats
    rng: jax.Array
    # Traced LR multiplier set by the host controller on instability
    # rollback (SRRaGAN_model.py:618-631 halves the optimizer LR); a traced
    # scalar so rollback does not trigger a recompile.
    lr_scale: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.ones((), jnp.float32))


def multistep_lr(base: float, steps, gamma: float, step: jnp.ndarray
                 ) -> jnp.ndarray:
    """MultiStepLR schedule value at ``step`` (torch semantics)."""
    lr = jnp.asarray(base, jnp.float32)
    for s in steps:
        lr = lr * jnp.where(step >= s, gamma, 1.0)
    return lr


class SRRaGANTrainer:
    """Builds the compiled train steps for one model/mesh configuration.

    ``g_apply(params, lr, z_hr) -> generated`` must already be CEM-wrapped
    in train mode (no pre-pad); ``d_apply(variables, x, train) ->
    (logits, new_batch_stats)``.
    """

    def __init__(self, cfg: TrainConfig, g_apply: Callable,
                 d_apply: Callable, margins_hr: int,
                 rules: ShardingRules | None = None,
                 f_apply: Callable | None = None,
                 g_apply_decomp: Callable | None = None):
        self.cfg = cfg
        self.g_apply = g_apply
        self.d_apply = d_apply
        self.f_apply = f_apply  # perceptual feature net (VGG19-54)
        # (low, high) CEM-decomposed forward for decomposed_d training
        # (cem_wrap(..., decompose=True); SRRaGAN_model.py:330-332)
        self.g_apply_decomp = g_apply_decomp
        if cfg.decomposed_d and g_apply_decomp is None:
            raise ValueError('decomposed_d=True requires g_apply_decomp')
        self.margins_hr = margins_hr
        self.rules = rules
        self.filter_cfg = FilterLossConfig(latent_channels=cfg.latent_channels)
        self.g_tx = optax.chain(
            optax.scale_by_adam(b1=cfg.beta1_g, b2=cfg.beta2_g),
            optax.scale(-1.0))
        self.d_tx = optax.chain(
            optax.scale_by_adam(b1=cfg.beta1_d, b2=cfg.beta2_d),
            optax.scale(-1.0))
        if rules is not None:
            # explicit shardings: state replicated, batch split on the
            # mesh's data/spatial axes — a dropped batch sharding is a
            # compile-time change (tested via the HLO, test_parallel.py),
            # not a silent full-replication regression; donating the state
            # lets XLA reuse its buffers across steps.  pjit disallows
            # kwargs alongside in_shardings, so the static flags become
            # positional behind keyword-friendly wrappers.
            sh = (rules.replicated, rules.batch)
            # out state pinned replicated: with donation + an unconstrained
            # output, GSPMD may return a state leaf sharded on a mesh axis
            # (seen on the data x spatial mesh), which then mismatches the
            # next step's replicated in_shardings.
            out_sh = (rules.replicated, rules.replicated)
            d_jit = tuned_jit(self._d_step, static_argnums=(2,),
                              in_shardings=sh, out_shardings=out_sh,
                              donate_argnums=(0,))
            g_jit = tuned_jit(self._g_step, static_argnums=(2, 3),
                              in_shardings=sh, out_shardings=out_sh,
                              donate_argnums=(0,))

            def d_step(state, batch, dual=True):
                return d_jit(state, batch, dual)

            def g_step(state, batch, dual=True, use_gan=True):
                return g_jit(state, batch, dual, use_gan)
            d_step.lower = lambda state, batch, dual=True: \
                d_jit.lower(state, batch, dual)
            g_step.lower = lambda state, batch, dual=True, use_gan=True: \
                g_jit.lower(state, batch, dual, use_gan)
            self.d_step, self.g_step = d_step, g_step
        else:
            self.d_step = tuned_jit(self._d_step, static_argnames=('dual',))
            self.g_step = tuned_jit(self._g_step,
                                    static_argnames=('dual', 'use_gan'))
        self.eval_forward = tuned_jit(self._eval_forward)

    # ------------------------------------------------------------------ init
    def init_state(self, g_params, d_vars, rng) -> GTrainState:
        state = GTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_opt=self.g_tx.init(g_params),
            d_vars=d_vars,
            d_opt=self.d_tx.init(d_vars['params']),
            # width >= 1 even for Z-less variants (latent_channels=0,
            # train_esrgan.json): the stats are never consumed then, but
            # orbax cannot serialize zero-size arrays
            ratio_stats=RatioStats.create(
                max(self.cfg.num_latent_channels, 1)),
            rng=rng)
        if self.rules is not None:
            state = self.rules.replicate(state)
        return state

    # ------------------------------------------------------------- utilities
    def unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        m = self.margins_hr
        return x[:, m:-m, m:-m, :] if m > 0 else x

    def sample_z(self, rng: jax.Array, batch_size: int, zh: int, zw: int):
        """(z_hr, svd_targets) — feed_data semantics
        (SRRaGAN_model.py:244-268)."""
        cfg = self.cfg
        nz = cfg.num_latent_channels
        u = jax.random.uniform(rng, (batch_size, 1, 1, nz))
        if cfg.svd_mode:
            theta = 2 * jnp.pi * u[..., -1]
            svd = {'theta': theta,
                   'lambda0_ratio': u[..., 0],
                   'lambda1_ratio': u[..., 1]}
            z = svd_to_latent_z(u[..., 0], u[..., 1], theta)
        else:
            svd = None
            z = 2 * u - 1
        z = jnp.broadcast_to(z, (batch_size, zh, zw, nz))
        return z, svd

    def _gan(self, pred, real: bool):
        return L.gan_loss(self.cfg.gan_type, pred, real,
                          self.cfg.hinge_threshold)

    def _d_forward(self, d_vars, x, update_stats: bool):
        return self.d_apply(d_vars, x, update_stats)

    # ---------------------------------------------------------------- D step
    @staticmethod
    def _microbatches(accum: int, *arrays):
        """Reshape [B, ...] arrays to [A, B/A, ...] microbatch stacks."""
        b = arrays[0].shape[0]
        assert b % accum == 0, f'batch {b} not divisible by accum {accum}'
        return tuple(a.reshape((accum, b // accum) + a.shape[1:])
                     for a in arrays)

    def _d_grads(self, state, lr_img, ref, z, map_rng, gp_rngs, dual: bool,
                 d_stats):
        """Gradients + metrics of the D loss on one microbatch.

        ``d_stats`` carries mutable collections (batch_stats) sequentially
        across microbatches, matching torch BN semantics under gradient
        accumulation.
        """
        cfg = self.cfg
        b = ref.shape[0]
        decomp = cfg.decomposed_d

        def gen(z_in):
            # decomposed fakes are (low, high) pairs, each unpadded
            # (SRRaGAN_model.py:330-332)
            if decomp:
                low, high = self.g_apply_decomp(state.g_params, lr_img, z_in)
                return (self.unpad(low), self.unpad(high))
            return self.unpad(self.g_apply(state.g_params, lr_img, z_in))

        fakes = [gen(z)]
        if dual:
            z_opt = self._optimal_z(state.g_params, lr_img, ref, z, map_rng)
            fakes.insert(0, gen(z_opt))
        fakes = [jax.lax.stop_gradient(f) for f in fakes]

        def d_loss_fn(d_params):
            d_vars = dict(state.d_vars, params=d_params, **d_stats)
            total = 0.0
            # decomposed real input: the ref image re-expressed around the
            # MAP fake's low-freq component (SRRaGAN_model.py:349)
            real_in = ((fakes[0][0], ref - fakes[0][0]) if decomp else ref)
            pred_real, new_stats = self._d_forward(d_vars, real_in, True)
            metrics = {}
            logits_diffs = []
            for i, fake in enumerate(fakes):
                pred_fake, new_stats = self._d_forward(
                    dict(d_vars, **{k: v for k, v in new_stats.items()}),
                    fake, True)
                if cfg.relativistic:
                    l_real = self._gan(pred_real - pred_fake.mean(), True)
                    l_fake = self._gan(pred_fake - pred_real.mean(), False)
                else:
                    l_real = 2 * self._gan(pred_real, True)
                    l_fake = 2 * self._gan(pred_fake, False)
                step_loss = (l_real + l_fake) / 2.0
                if cfg.gan_type == 'wgan-gp':
                    if decomp:
                        # interp is a full image; the D sees it decomposed
                        # around the fake's fixed low-freq component, so the
                        # penalty grad flows only through interp - low
                        # (SRRaGAN_model.py:367-369)
                        low_i = fake[0]
                        gp = L.gradient_penalty(
                            lambda x, lo=low_i: self._d_forward(
                                d_vars, (lo, x - lo), False)[0],
                            ref, fake[0] + fake[1], gp_rngs[i])
                    else:
                        gp = L.gradient_penalty(
                            lambda x: self._d_forward(d_vars, x, False)[0],
                            ref, fake, gp_rngs[i])
                    step_loss = step_loss + cfg.gp_weight * gp
                    metrics[f'l_d_gp_{i}'] = gp
                total = total + step_loss
                logits_diffs.append(
                    (pred_real - pred_fake).reshape(b, -1).mean(axis=1))
                metrics.update({f'l_d_real_{i}': l_real,
                                f'l_d_fake_{i}': l_fake,
                                f'D_real_{i}': pred_real.mean(),
                                f'D_fake_{i}': pred_fake.mean()})
            total = total / len(fakes)
            metrics['D_logits_diff'] = jnp.stack(logits_diffs).mean()
            metrics['Correctly_distinguished'] = (
                jnp.stack(logits_diffs) > 0).mean()
            metrics['l_d_total'] = total
            return total, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_vars['params'])
        return grads, metrics, new_stats

    def _d_step(self, state: GTrainState, batch, dual: bool):
        cfg = self.cfg
        accum = max(1, cfg.grad_accum_d)
        rng, z_rng, map_rng, gp_rng, q_rng = jax.random.split(state.rng, 5)
        lr_img, hr = batch['lr'], batch['hr']
        b, hh, wh = hr.shape[0], hr.shape[1], hr.shape[2]
        # Z / quantization noise sampled once for the full virtual batch,
        # then split — so an accumulated 2xB/2 step consumes the exact same
        # randomness as a single-B step.
        z, _ = self.sample_z(z_rng, b, hh, wh)
        if cfg.add_quantization_noise:
            hr = hr + (jax.random.uniform(q_rng, hr.shape) - 0.5) / 255.0
        ref = self.unpad(hr)
        d_stats = {k: v for k, v in state.d_vars.items() if k != 'params'}

        if accum == 1:
            grads, metrics, new_stats = self._d_grads(
                state, lr_img, ref, z, map_rng,
                jax.random.split(gp_rng, 2), dual, d_stats)
        else:
            mb = self._microbatches(accum, lr_img, ref, z)
            map_rngs = jax.random.split(map_rng, accum)
            gp_rngs = jax.random.split(gp_rng, (accum, 2))
            zero = jax.tree.map(jnp.zeros_like, state.d_vars['params'])

            def body(carry, xs):
                acc, stats = carry
                lr_i, ref_i, z_i, mrng, gprngs = xs
                g, m, new_stats = self._d_grads(state, lr_i, ref_i, z_i,
                                                mrng, gprngs, dual, stats)
                acc = jax.tree.map(jnp.add, acc, g)
                return (acc, new_stats or stats), m

            (acc, new_stats), metrics = jax.lax.scan(
                body, (zero, d_stats),
                (mb[0], mb[1], mb[2], map_rngs, gp_rngs))
            grads = jax.tree.map(lambda u: u / accum, acc)
            metrics = jax.tree.map(lambda v: v.mean(axis=0), metrics)

        lr = state.lr_scale * multistep_lr(cfg.lr_d, cfg.lr_steps,
                                           cfg.lr_gamma, state.step)
        updates, d_opt = self.d_tx.update(grads, state.d_opt,
                                          state.d_vars['params'])
        updates = jax.tree.map(lambda u: lr * u, updates)
        d_params = optax.apply_updates(state.d_vars['params'], updates)
        d_vars = dict(state.d_vars, params=d_params, **new_stats)
        return state.replace(d_vars=d_vars, d_opt=d_opt, rng=rng), metrics

    # ------------------------------------------------------- MAP inner loop
    def _optimal_z(self, g_params, lr_img, hr_unpadded, z_like, rng):
        """10 Adam(lr=1) steps on pre-tanh Z against L1-to-GT, generator
        frozen; xavier-gain-100 random init (Z_optimizer in training mode,
        SRRaGAN_model.py:109-123; Z_optimization.py:308-313,603)."""
        cfg = self.cfg
        b, zh, zw, nz = z_like.shape
        fan_in, fan_out = nz * zh * zw, b * zh * zw
        a = 100.0 * np.sqrt(6.0 / (fan_in + fan_out))
        theta0 = jax.random.uniform(rng, z_like.shape, z_like.dtype, -a, a)
        inner_tx = optax.adam(cfg.optimal_z_lr)

        def loss_of(theta):
            z = jnp.tanh(theta)
            fake = self.unpad(self.g_apply(g_params, lr_img, z))
            return jnp.abs(fake - hr_unpadded).mean()

        def step(carry, _):
            theta, opt_state = carry
            g = jax.grad(loss_of)(theta)
            upd, opt_state = inner_tx.update(g, opt_state)
            return (optax.apply_updates(theta, upd), opt_state), None

        (theta, _), _ = jax.lax.scan(
            step, (theta0, inner_tx.init(theta0)), None,
            length=cfg.optimal_z_iters)
        return jax.lax.stop_gradient(jnp.tanh(theta))

    # ---------------------------------------------------------------- G step
    def _g_grads(self, state, lr_img, ref, z_static, svd, map_rng,
                 ratio_stats, dual: bool, use_gan: bool):
        """Gradients + metrics of the G loss on one microbatch;
        ``ratio_stats`` (FilterLoss percentile reservoirs) threads
        sequentially across microbatches (SRRaGAN_model.py:416-480)."""
        cfg = self.cfg
        z_opt = (self._optimal_z(state.g_params, lr_img, ref, z_static,
                                 map_rng) if dual else None)
        n_steps = 2 if dual else 1

        def g_loss_fn(g_params):
            metrics = {}
            total = 0.0
            new_stats = ratio_stats
            zs = ([(z_opt, True)] if dual else []) + [(z_static, False)]
            for z, is_opt in zs:
                if cfg.decomposed_d:
                    # non-adversarial losses see the summed image
                    # (SRRaGAN_model.py:434,449); the D sees the pair
                    low, high = self.g_apply_decomp(g_params, lr_img, z)
                    low, high = self.unpad(low), self.unpad(high)
                    fake = low + high
                else:
                    low = None
                    fake = self.unpad(self.g_apply(g_params, lr_img, z))
                if cfg.range_weight:
                    l_range = L.range_loss(fake, cfg.input_range)
                    total = total + cfg.range_weight * l_range / n_steps
                    metrics['l_g_range'] = l_range
                if cfg.pixel_weight:
                    l_pix = jnp.abs(fake - ref).mean()
                    total = total + cfg.pixel_weight * l_pix / n_steps
                    metrics['l_g_pix'] = l_pix
                if cfg.feature_weight and self.f_apply is not None:
                    real_fea = jax.lax.stop_gradient(self.f_apply(ref))
                    fake_fea = self.f_apply(fake)
                    l_fea = jnp.abs(fake_fea - real_fea).mean()
                    total = total + cfg.feature_weight * l_fea / n_steps
                    metrics['l_g_fea'] = l_fea
                if is_opt and cfg.optimal_z_weight:
                    l_map = jnp.abs(fake - ref).mean()
                    total = total + cfg.optimal_z_weight * l_map
                    metrics['l_g_optimalZ'] = l_map
                if (not is_opt) and cfg.latent_weight:
                    l_lat, new_stats = filter_loss(
                        self.filter_cfg, ratio_stats, fake, ref, z,
                        svd)
                    total = total + cfg.latent_weight * l_lat.mean()
                    metrics['l_g_latent'] = l_lat.mean()
                if use_gan:
                    d_in = (low, high) if cfg.decomposed_d else fake
                    pred_fake, _ = self._d_forward(state.d_vars, d_in, False)
                    if cfg.relativistic:
                        real_in = ((low, ref - low) if cfg.decomposed_d
                                   else ref)
                        pred_real, _ = self._d_forward(state.d_vars, real_in,
                                                       False)
                        pred_real = jax.lax.stop_gradient(pred_real)
                        l_gan = (self._gan(pred_real - pred_fake.mean(),
                                           False)
                                 + self._gan(pred_fake - pred_real.mean(),
                                             True)) / 2
                    else:
                        l_gan = self._gan(pred_fake, True)
                    total = total + cfg.gan_weight * l_gan / n_steps
                    metrics['l_g_gan'] = l_gan
            metrics['l_g_total'] = total
            return total, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        return grads, metrics, new_stats

    def _g_step(self, state: GTrainState, batch, dual: bool, use_gan: bool):
        cfg = self.cfg
        accum = max(1, cfg.grad_accum_g)
        rng, z_rng, map_rng = jax.random.split(state.rng, 3)
        lr_img, hr = batch['lr'], batch['hr']
        b, hh, wh = hr.shape[0], hr.shape[1], hr.shape[2]
        z_static, svd = self.sample_z(z_rng, b, hh, wh)
        ref = self.unpad(hr)

        if accum == 1:
            grads, metrics, new_stats = self._g_grads(
                state, lr_img, ref, z_static, svd, map_rng,
                state.ratio_stats, dual, use_gan)
        else:
            svd_flat = svd if svd is None else dict(svd)
            parts = [lr_img, ref, z_static] + (
                list(svd_flat.values()) if svd_flat else [])
            mb = self._microbatches(accum, *parts)
            svd_mb = (None if svd_flat is None else
                      dict(zip(svd_flat.keys(), mb[3:])))
            map_rngs = jax.random.split(map_rng, accum)
            zero = jax.tree.map(jnp.zeros_like, state.g_params)

            def body(carry, xs):
                acc, stats = carry
                lr_i, ref_i, z_i, svd_i, mrng = xs
                g, m, new_stats = self._g_grads(state, lr_i, ref_i, z_i,
                                                svd_i, mrng, stats, dual,
                                                use_gan)
                return (jax.tree.map(jnp.add, acc, g), new_stats), m

            (acc, new_stats), metrics = jax.lax.scan(
                body, (zero, state.ratio_stats),
                (mb[0], mb[1], mb[2], svd_mb, map_rngs))
            grads = jax.tree.map(lambda u: u / accum, acc)
            metrics = jax.tree.map(lambda v: v.mean(axis=0), metrics)

        lr = state.lr_scale * multistep_lr(cfg.lr_g, cfg.lr_steps,
                                           cfg.lr_gamma, state.step)
        updates, g_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
        updates = jax.tree.map(lambda u: lr * u, updates)
        g_params = optax.apply_updates(state.g_params, updates)
        return state.replace(g_params=g_params, g_opt=g_opt,
                             ratio_stats=new_stats, rng=rng), metrics

    @staticmethod
    def advance(state: GTrainState) -> GTrainState:
        """One gradient-step tick (the host calls this once per outer
        iteration, whether G, D, or both ran)."""
        return state.replace(step=state.step + 1)

    def _eval_forward(self, g_params, lr_img, z):
        return self.g_apply(g_params, lr_img, z)


def flax_d_adapter(d_module):
    """Adapter: flax discriminator -> the trainer's d_apply contract.

    ``d_apply(d_vars, x, update_stats) -> (logits, new_collections)`` where
    ``new_collections`` holds updated 'batch_stats' (empty if the module has
    none or update_stats=False).
    """
    def d_apply(d_vars, x, update_stats):
        if 'batch_stats' in d_vars:
            # train mode always normalizes by batch statistics (torch BN
            # semantics); running averages are only *kept* when requested
            logits, new_cols = d_module.apply(d_vars, x, train=True,
                                              mutable=['batch_stats'])
            return logits, (dict(new_cols) if update_stats else {})
        return d_module.apply(d_vars, x, train=True), {}
    return d_apply
