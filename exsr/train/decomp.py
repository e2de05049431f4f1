"""Explorable-JPEG (DecompCNN) trainer — compiled G/D steps in the DCT
domain.

Reference: codes/models/DecompCNN_model.py (1061 LoC), the JPEG twin of the
SRRaGAN trainer.  Reproduced step semantics:
  * inputs are quantized DCT coefficient maps from the differentiable codec
    (per-batch quality factors re-scale the Q tables every step —
    DecompCNN_model.py:336-339);
  * consistency is structural: the DnCNN's residual sigmoid-0.5 head keeps
    every output coefficient inside its quantization bin, so the in-model
    Enforce_Consistency is the identity (DecompCNN_model.py:269-270,
    architecture.py:204-214);
  * D judges DCT-domain inputs, optionally pre-multiplied by the Q table
    ('DCT_premult'), optionally concatenated with the compressed input
    and/or Z (DecompCNN_model.py:389-413);
  * the G losses mirror the SR twin: range on the extracted image, latent
    L_struct with NOISE_STD=1 (loss.py:50), MAP optimal-Z L1, adversarial;
  * Y-channel mode here; the chroma pipeline (mixed real/fake Y channels,
    chroma generator conditioned on the Y output) rides the same codec
    (DecompCNN_model.py:23-24,379-383,711-729) and is wired via
    ``chroma_mode``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from exsr.utils.compile import tuned_jit

from exsr.jpeg.codec import JPEGCodec
from exsr.losses import losses as L
from exsr.losses.filter_loss import (FilterLossConfig, RatioStats,
                                     filter_loss, num_latent_channels)
from exsr.ops.structure_tensor import svd_to_latent_z
from exsr.train.srragan import multistep_lr


@dataclasses.dataclass(frozen=True)
class DecompConfig:
    """Mirrors options/train/train_JPEG.json (Y model)."""
    patch_size: int = 256
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1: float = 0.9
    lr_steps: tuple[int, ...] = ()
    lr_gamma: float = 0.5
    gan_type: str = 'wgan-gp'
    gan_weight: float | None = 1.0
    gp_weight: float = 10.0
    range_weight: float | None = 5000.0
    latent_weight: float | None = 1.0
    optimal_z_weight: float | None = 100.0
    optimal_z_iters: int = 10
    optimal_z_lr: float = 1.0
    latent_channels: str | int = 64
    relativistic: bool = False
    hinge_threshold: float | None = None
    dct_premult_d: bool = True        # 'DCT_premult' D input type
    concat_d_input: bool = False
    inject_z_to_d: bool = False
    chroma_mode: bool = False
    niter: int = 2_000_000

    @property
    def num_latent_channels(self) -> int:
        return num_latent_channels(self.latent_channels)

    @property
    def svd_mode(self) -> bool:
        return self.latent_channels in ('SVD_structure_tensor',
                                        'SVDinNormedOut_structure_tensor')


class DecompTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    d_vars: Any
    d_opt: Any
    ratio_stats: RatioStats
    rng: jax.Array


def repeat_z_3_channels(z3: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """Tile a 3-channel Z onto num_channels (DecompCNN_model.py:293-297);
    channels-last."""
    if num_channels <= 3:
        return z3[..., :num_channels]
    reps = num_channels // 3
    rem = num_channels % 3
    return jnp.concatenate([jnp.tile(z3, (1, 1, 1, reps)),
                            z3[..., :rem]], axis=-1)


def z_to_3_channels(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse mapping: average the tiled groups
    (DecompCNN_model.py:299-314); channels-last."""
    n, h, w, c = z.shape
    if c <= 3:
        return z
    pad = int(np.ceil(c / 3) * 3 - c)
    zp = jnp.pad(z, ((0, 0),) * 3 + ((0, pad),))
    zp = zp.reshape(n, h, w, -1, 3)
    # exact per-channel occurrence counts (the reference derives these via
    # float32 arithmetic — DecompCNN_model.py:308 — equal in exact math)
    reps, rem = divmod(c, 3)
    norm = np.array([reps + (i < rem) for i in range(3)], np.float64)
    return zp.sum(axis=3) / jnp.asarray(norm, z.dtype)


class DecompTrainer:
    """``g_apply(params, coeffs, z) -> coeffs`` is the DnCNN generator
    (already consistency-bounded); ``d_apply(d_vars, x, update_stats)``
    follows the same contract as the SR trainer."""

    def __init__(self, cfg: DecompConfig, g_apply: Callable,
                 d_apply: Callable | None,
                 g_stats_apply: Callable | None = None, rules=None):
        self.cfg = cfg
        self.g_apply = g_apply
        self.d_apply = d_apply
        # optional exsr.parallel.mesh.ShardingRules — batch-sharded data
        # parallelism for the JPEG trainer (the reference DataParallel-
        # wraps the DnCNN nets too, networks.py:157-181); same explicit-
        # sharding + donation pattern as SRRaGANTrainer
        self.rules = rules
        # optional BatchNorm running-stats capture:
        # ``g_stats_apply(g_params, coeffs, z) -> (out, batch_stats)``.
        # The reference's torch BN accumulates running stats on every
        # train-mode forward (DecompCNN_model.py netG.train()); in flax
        # the mutated collection must be threaded explicitly or eval-mode
        # inference silently runs on init stats.  When set, the g_step's
        # static-Z loss forward uses it and the fresh stats ride the
        # has_aux channel into the updated state — no extra forward.
        self.g_stats_apply = g_stats_apply
        self.codec = JPEGCodec()
        # integer latent_channels means plain control channels with no
        # L_struct loss (loss.py:38: model_training iff the descriptor is a
        # string)
        self.latent_loss_active = (cfg.latent_weight is not None
                                   and isinstance(cfg.latent_channels, str))
        self.filter_cfg = FilterLossConfig(
            latent_channels=cfg.latent_channels
            if isinstance(cfg.latent_channels, str) else 'structure_tensor',
            noise_std=1.0)
        self.g_tx = optax.chain(optax.scale_by_adam(b1=cfg.beta1),
                                optax.scale(-1.0))
        self.d_tx = optax.chain(optax.scale_by_adam(b1=cfg.beta1),
                                optax.scale(-1.0))
        if rules is not None:
            # state replicated, batch leaves split on 'data' ([B,..,..,C]
            # 'uncomp' on the data x spatial axes, [B] 'qf' leading-data);
            # out state pinned replicated (see srragan.py for why), state
            # donated so XLA reuses its buffers across steps.  pjit
            # disallows kwargs with in_shardings, so the static flags go
            # positional behind keyword-friendly wrappers.
            sh = (rules.replicated,
                  {'uncomp': rules.batch, 'qf': rules.per_sample(1)})
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
            self.d_step = tuned_jit(self._d_step,
                                    static_argnames=('dual',))
            self.g_step = tuned_jit(self._g_step,
                                    static_argnames=('dual', 'use_gan'))
        self.decode = jax.jit(self._decode)

    def init_state(self, g_params, d_vars, rng) -> DecompTrainState:
        state = DecompTrainState(
            step=jnp.zeros((), jnp.int32), g_params=g_params,
            g_opt=self.g_tx.init(g_params), d_vars=d_vars,
            d_opt=self.d_tx.init(d_vars['params']) if d_vars else None,
            ratio_stats=RatioStats.create(
                3 if self.cfg.svd_mode else self.cfg.num_latent_channels),
            rng=rng)
        if self.rules is not None:
            state = self.rules.replicate(state)
        return state

    # -------------------------------------------------------------- helpers
    def sample_z(self, rng, batch_size, hb, wb):
        """feed_data Z sampling (DecompCNN_model.py:344-367)."""
        cfg = self.cfg
        nz = cfg.num_latent_channels
        if cfg.svd_mode:
            u = jax.random.uniform(rng, (batch_size, 1, 1, 3))
            theta = 2 * jnp.pi * u[..., -1]
            svd = {'theta': theta, 'lambda0_ratio': u[..., 0],
                   'lambda1_ratio': u[..., 1]}
            z3 = svd_to_latent_z(u[..., 0], u[..., 1], theta)
            z = repeat_z_3_channels(z3, nz)
        else:
            u = jax.random.uniform(rng, (batch_size, 1, 1, nz))
            z = 2 * u - 1
            svd = None
        return jnp.broadcast_to(z, (batch_size, hb, wb, nz)), svd

    def _decode(self, g_params, coeffs, z, qf):
        out_coeffs = self.g_apply(g_params, coeffs, z)
        return self.codec.extract(out_coeffs, qf)

    def _d_input(self, coeffs_out, comp_coeffs, z, qf):
        """Assemble the critic's DCT-domain input
        (DecompCNN_model.py:389-413)."""
        x = coeffs_out
        if self.cfg.dct_premult_d:
            q = self.codec.q_tables(qf)
            x = x * q
        parts = []
        if self.cfg.inject_z_to_d and z is not None:
            parts.append(z)
        if self.cfg.concat_d_input:
            parts.append(comp_coeffs)
        return jnp.concatenate(parts + [x], axis=-1) if parts else x

    def _gan(self, pred, real):
        return L.gan_loss(self.cfg.gan_type, pred, real,
                          self.cfg.hinge_threshold)

    # --------------------------------------------------------------- D step
    def _d_step(self, state: DecompTrainState, batch, dual: bool):
        cfg = self.cfg
        rng, z_rng, map_rng, gp_rng, gp_rng2 = jax.random.split(state.rng, 5)
        uncomp, qf = batch['uncomp'], batch['qf'].astype(jnp.float32)
        comp = self.codec.compress(uncomp, qf, quantize=True)
        b, hb, wb = comp.shape[:3]
        z, _ = self.sample_z(z_rng, b, hb, wb)
        ref_coeffs = self.codec.compress(uncomp, qf, quantize=False)
        ref = self._d_input(ref_coeffs, comp, z, qf)
        fakes = [jax.lax.stop_gradient(
            self._d_input(self.g_apply(state.g_params, comp, z), comp, z,
                          qf))]
        if dual:
            z_opt = self._optimal_z(state.g_params, comp, uncomp, z, qf,
                                    map_rng)
            fakes.insert(0, jax.lax.stop_gradient(self._d_input(
                self.g_apply(state.g_params, comp, z_opt), comp, z_opt,
                qf)))

        def d_loss_fn(d_params):
            d_vars = dict(state.d_vars, params=d_params)
            total = 0.0
            metrics = {}
            pred_real, new_stats = self.d_apply(d_vars, ref, True)
            diffs = []
            for i, fake in enumerate(fakes):
                pred_fake, new_stats = self.d_apply(
                    dict(d_vars, **new_stats), fake, True)
                if cfg.relativistic:
                    l_real = self._gan(pred_real - pred_fake.mean(), True)
                    l_fake = self._gan(pred_fake - pred_real.mean(), False)
                else:
                    l_real = 2 * self._gan(pred_real, True)
                    l_fake = 2 * self._gan(pred_fake, False)
                step_loss = (l_real + l_fake) / 2
                if 'gp' in cfg.gan_type and cfg.gp_weight > 0:
                    gp = L.gradient_penalty(
                        lambda x: self.d_apply(d_vars, x, False)[0],
                        ref, fake, gp_rng if i == 0 else gp_rng2)
                    step_loss = step_loss + cfg.gp_weight * gp
                total = total + step_loss
                diffs.append((pred_real - pred_fake).reshape(b, -1)
                             .mean(axis=1))
                metrics.update({f'l_d_real_{i}': l_real,
                                f'l_d_fake_{i}': l_fake})
            metrics['D_logits_diff'] = jnp.stack(diffs).mean()
            metrics['Correctly_distinguished'] = (
                jnp.stack(diffs) > 0).mean()
            return total / len(fakes), (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_vars['params'])
        lr = multistep_lr(cfg.lr_d, cfg.lr_steps, cfg.lr_gamma, state.step)
        upd, d_opt = self.d_tx.update(grads, state.d_opt,
                                      state.d_vars['params'])
        upd = jax.tree.map(lambda u: lr * u, upd)
        d_params = optax.apply_updates(state.d_vars['params'], upd)
        metrics['l_d_total'] = loss
        return state.replace(
            d_vars=dict(state.d_vars, params=d_params, **new_stats),
            d_opt=d_opt, rng=rng), metrics

    # ------------------------------------------------------------ MAP inner
    def _optimal_z(self, g_params, comp, uncomp, z_like, qf, rng):
        cfg = self.cfg
        b, hb, wb, nz = z_like.shape
        fan_in, fan_out = nz * hb * wb, b * hb * wb
        a = 100.0 * np.sqrt(6.0 / (fan_in + fan_out))
        theta0 = jax.random.uniform(rng, z_like.shape, z_like.dtype, -a, a)
        tx = optax.adam(cfg.optimal_z_lr)

        def loss_of(theta):
            zz = jnp.tanh(theta)
            img = self.codec.extract(self.g_apply(g_params, comp, zz), qf)
            return jnp.abs(img / 255.0 - uncomp / 255.0).mean()

        def step(carry, _):
            theta, opt = carry
            g = jax.grad(loss_of)(theta)
            u, opt = tx.update(g, opt)
            return (optax.apply_updates(theta, u), opt), None

        (theta, _), _ = jax.lax.scan(step, (theta0, tx.init(theta0)), None,
                                     length=cfg.optimal_z_iters)
        return jax.lax.stop_gradient(jnp.tanh(theta))

    # --------------------------------------------------------------- G step
    def _g_step(self, state: DecompTrainState, batch, dual: bool,
                use_gan: bool):
        cfg = self.cfg
        rng, z_rng, map_rng = jax.random.split(state.rng, 3)
        uncomp, qf = batch['uncomp'], batch['qf'].astype(jnp.float32)
        comp = self.codec.compress(uncomp, qf, quantize=True)
        b, hb, wb = comp.shape[:3]
        z_static, svd = self.sample_z(z_rng, b, hb, wb)
        z_opt = (self._optimal_z(state.g_params, comp, uncomp, z_static,
                                 qf, map_rng) if dual else None)
        n_steps = 2 if dual else 1

        def g_loss_fn(g_params):
            total = 0.0
            metrics = {}
            new_stats = state.ratio_stats
            new_bn = None
            zs = ([(z_opt, True)] if dual else []) + [(z_static, False)]
            for z, is_opt in zs:
                if (not is_opt) and self.g_stats_apply is not None:
                    # capture BN running stats from the train-mode
                    # forward (torch semantics: stats update during the
                    # loss forward, pre-update params)
                    coeffs, new_bn = self.g_stats_apply(g_params, comp, z)
                else:
                    coeffs = self.g_apply(g_params, comp, z)
                img = self.codec.extract(coeffs, qf)
                if cfg.range_weight:
                    l_range = L.range_loss(img / 255.0)
                    total = total + cfg.range_weight * l_range / n_steps
                    metrics['l_g_range'] = l_range
                if is_opt and cfg.optimal_z_weight:
                    l_map = jnp.abs(img / 255.0 - uncomp / 255.0).mean()
                    total = total + cfg.optimal_z_weight * l_map
                    metrics['l_g_optimalZ'] = l_map
                if (not is_opt) and self.latent_loss_active:
                    z3 = z_to_3_channels(z) if cfg.svd_mode else z
                    l_lat, new_stats = filter_loss(
                        self.filter_cfg, state.ratio_stats, img, uncomp,
                        z3, svd)
                    total = total + cfg.latent_weight * l_lat.mean()
                    metrics['l_g_latent'] = l_lat.mean()
                if use_gan and self.d_apply is not None:
                    d_in = self._d_input(coeffs, comp, z, qf)
                    pred_fake, _ = self.d_apply(state.d_vars, d_in, False)
                    l_gan = self._gan(pred_fake, True)
                    total = total + (cfg.gan_weight or 0.0) * l_gan \
                        / n_steps
                    metrics['l_g_gan'] = l_gan
            metrics['l_g_total'] = total
            return total, (metrics, new_stats, new_bn)

        (loss, (metrics, new_stats, new_bn)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        lr = multistep_lr(cfg.lr_g, cfg.lr_steps, cfg.lr_gamma, state.step)
        upd, g_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
        upd = jax.tree.map(lambda u: lr * u, upd)
        g_params = optax.apply_updates(state.g_params, upd)
        if new_bn is not None:
            g_params = dict(g_params, batch_stats=new_bn)
        return state.replace(g_params=g_params, g_opt=g_opt,
                             ratio_stats=new_stats, rng=rng), metrics

    @staticmethod
    def advance(state: DecompTrainState) -> DecompTrainState:
        return state.replace(step=state.step + 1)
