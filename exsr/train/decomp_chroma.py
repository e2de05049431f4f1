"""Chroma-mode explorable-JPEG trainer.

Reference: DecompCNN_model.py chroma path — a second generator reconstructs
the two chroma channels' low-frequency DCT coefficients, conditioned on the
(fake or real) Y channel:
  * the codec runs on 16x16 blocks; chroma downsampling is modeled by
    wiping coefficients outside the low-frequency 8x8 quadrant
    (JPEG.py:143-151, USE_Y_GENERATOR_4_CHROMA / NO_HIGH_FREQ_CHROMA_
    RECONSTRUCTION — DecompCNN_model.py:23-24);
  * the chroma generator consumes [Z ++ Y-coeffs(256) ++ chroma-low(128)]
    and emits 2x64 low-freq chroma coefficients via the chroma residual
    head (architecture.py:207-212, networks.py:101-110);
  * for the D, the Y channel of fake batches is a random 1:1 mix of real
    Y and the Y-generator's output so the critic cannot separate on Y
    alone (mixed_Y_4_training, DecompCNN_model.py:379-383);
  * the Y generator runs on its own 8x8 grid and is typically frozen
    (trained by the Y-model phase); its output feeds the chroma pipeline
    (test_Y_, DecompCNN_model.py:711-729).
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
from exsr.train.decomp import DecompConfig
from exsr.train.srragan import multistep_lr


class ChromaTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    gc_params: Any          # chroma generator
    gc_opt: Any
    d_vars: Any
    d_opt: Any
    rng: jax.Array


def regroup_y_coeffs_16(y_coeffs8: jnp.ndarray) -> jnp.ndarray:
    """[N, H/8, W/8, 64] Y coefficients -> [N, H/16, W/16, 256] by grouping
    2x2 neighborhoods of 8x8 blocks onto the 16x16 grid (the chroma model's
    Y conditioning input keeps the 8x8 Y blocks, 4 per 16x16 cell)."""
    n, hb, wb, c = y_coeffs8.shape
    x = y_coeffs8.reshape(n, hb // 2, 2, wb // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hb // 2, wb // 2,
                                                 4 * c)


class ChromaDecompTrainer:
    """``gy_apply(coeffs8, z8) -> coeffs8`` is the (frozen) Y generator;
    ``gc_apply(params, packed16, z16) -> 2*64 chroma coeffs`` the chroma
    generator; ``d_apply`` as elsewhere."""

    def __init__(self, cfg: DecompConfig, gy_apply: Callable,
                 gc_apply: Callable, d_apply: Callable | None,
                 g_stats_apply: Callable | None = None, rules=None):
        assert cfg.chroma_mode
        self.cfg = cfg
        self.codec_y = JPEGCodec()
        self.codec = JPEGCodec(chroma_mode=True, block_size=16)
        self.gy_apply = gy_apply
        self.gc_apply = gc_apply
        self.d_apply = d_apply
        # see DecompTrainer: ``g_stats_apply(params, packed, z) ->
        # (coeffs, batch_stats)`` captures flax BN running stats from the
        # train-mode loss forward
        self.g_stats_apply = g_stats_apply
        self.g_tx = optax.chain(optax.scale_by_adam(b1=cfg.beta1),
                                optax.scale(-1.0))
        self.d_tx = optax.chain(optax.scale_by_adam(b1=cfg.beta1),
                                optax.scale(-1.0))
        self.rules = rules
        if rules is not None:
            # batch-sharded data parallelism (see DecompTrainer): state
            # replicated + donated, per-sample batch leaves on 'data'
            sh = (rules.replicated,
                  {'uncomp': rules.batch, 'qf': rules.per_sample(1)})
            out_sh = (rules.replicated, rules.replicated)
            s_jit = tuned_jit(self._step, static_argnums=(2,),
                              in_shardings=sh, out_shardings=out_sh,
                              donate_argnums=(0,))

            def step_fn(state, batch, use_gan=True):
                return s_jit(state, batch, use_gan)
            step_fn.lower = lambda state, batch, use_gan=True: \
                s_jit.lower(state, batch, use_gan)
            self.step_fn = step_fn
        else:
            self.step_fn = tuned_jit(self._step,
                                     static_argnames=('use_gan',))
        self.decode = jax.jit(self._decode)

    def init_state(self, gc_params, d_vars, rng) -> ChromaTrainState:
        state = ChromaTrainState(
            step=jnp.zeros((), jnp.int32), gc_params=gc_params,
            gc_opt=self.g_tx.init(gc_params), d_vars=d_vars,
            d_opt=self.d_tx.init(d_vars['params']) if d_vars else None,
            rng=rng)
        if self.rules is not None:
            state = self.rules.replicate(state)
        return state

    # ---------------------------------------------------------------- pieces
    def _fake_y(self, y_img, qf, rng, mix: bool):
        """Quantized-Y -> Y-generator output, randomly mixed with real Y
        per image (DecompCNN_model.py:379-383)."""
        comp_y = self.codec_y.compress(y_img, qf, quantize=True)
        hb = comp_y.shape[1]
        z8 = jnp.zeros(comp_y.shape[:3] + (0,))
        fake_coeffs = self.gy_apply(comp_y, None)
        fake_y = self.codec_y.extract(fake_coeffs, qf)
        if not mix:
            return fake_y, jnp.ones((y_img.shape[0],), bool)
        is_fake = jax.random.bernoulli(rng, 0.5, (y_img.shape[0],))
        mixed = jnp.where(is_fake[:, None, None, None], fake_y, y_img)
        return mixed, is_fake

    def _chroma_inputs(self, ycbcr, y_for_cond, qf):
        """(packed generator input [.., 256+128], quantized chroma low
        [.., 128], full-ref chroma [.., 128])."""
        img = jnp.concatenate([y_for_cond, ycbcr[..., 1:]], axis=-1)
        packed = self.codec.compress_ycbcr(img, qf,
                                           downsample_or_quantize=True)
        ref = self.codec.compress_ycbcr(ycbcr, qf,
                                        downsample_or_quantize='downsample_only')
        return packed, packed[..., 256:], ref[..., 256:]

    def _decode(self, gc_params, packed, qf):
        """Chroma generator forward -> CbCr image [N, H, W, 2]."""
        z16 = jnp.zeros(packed.shape[:3] + (0,))
        chroma_coeffs = self.gc_apply(gc_params, packed, z16)
        return self.codec.extract_ycbcr(chroma_coeffs, qf)

    # ----------------------------------------------------------------- step
    def _step(self, state: ChromaTrainState, batch, use_gan: bool):
        cfg = self.cfg
        rng, mix_rng, gp_rng = jax.random.split(state.rng, 3)
        ycbcr, qf = batch['uncomp'], batch['qf'].astype(jnp.float32)
        y_img = ycbcr[..., :1]
        y_cond, y_is_fake = self._fake_y(y_img, qf, mix_rng, mix=True)
        packed, comp_chroma, ref_chroma = self._chroma_inputs(
            ycbcr, y_cond, qf)

        metrics = {}
        # ---- D step (DCT-domain chroma + Y conditioning channels)
        if self.d_apply is not None:
            fake_coeffs = jax.lax.stop_gradient(self.gc_apply(
                state.gc_params, packed,
                jnp.zeros(packed.shape[:3] + (0,))))
            d_real_in = jnp.concatenate([packed[..., :256], ref_chroma],
                                        axis=-1)
            d_fake_in = jnp.concatenate([packed[..., :256], fake_coeffs],
                                        axis=-1)

            def d_loss_fn(d_params):
                d_vars = dict(state.d_vars, params=d_params)
                pred_real, new_stats = self.d_apply(d_vars, d_real_in, True)
                pred_fake, new_stats = self.d_apply(
                    dict(d_vars, **new_stats), d_fake_in, True)
                l = (2 * L.gan_loss(cfg.gan_type, pred_real, True)
                     + 2 * L.gan_loss(cfg.gan_type, pred_fake, False)) / 2
                if 'gp' in cfg.gan_type:
                    gp = L.gradient_penalty(
                        lambda x: self.d_apply(d_vars, x, False)[0],
                        d_real_in, d_fake_in, gp_rng)
                    l = l + cfg.gp_weight * gp
                return l, new_stats
            (d_loss, new_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_vars['params'])
            lr_d = multistep_lr(cfg.lr_d, cfg.lr_steps, cfg.lr_gamma,
                                state.step)
            upd, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                          state.d_vars['params'])
            upd = jax.tree.map(lambda u: lr_d * u, upd)
            d_vars = dict(state.d_vars,
                          params=optax.apply_updates(
                              state.d_vars['params'], upd), **new_stats)
            metrics['l_d_total'] = d_loss
        else:
            d_vars, d_opt = state.d_vars, state.d_opt

        # ---- G step: pixel-domain chroma L1 + range + gan
        def g_loss_fn(gc_params):
            m = {}
            z16 = jnp.zeros(packed.shape[:3] + (0,))
            if self.g_stats_apply is not None:
                # capture BN running stats from the train-mode loss
                # forward (see DecompTrainer)
                chroma_coeffs, new_bn = self.g_stats_apply(
                    gc_params, packed, z16)
            else:
                new_bn = None
                chroma_coeffs = self.gc_apply(gc_params, packed, z16)
            chroma_img = self.codec.extract_ycbcr(chroma_coeffs, qf)
            l = 0.0
            l_pix = jnp.abs(chroma_img / 255.0
                            - ycbcr[..., 1:] / 255.0).mean()
            m['l_g_pix'] = l_pix
            l = l + (cfg.optimal_z_weight or 1.0) * l_pix
            if cfg.range_weight:
                l_range = L.range_loss(chroma_img / 255.0)
                m['l_g_range'] = l_range
                l = l + cfg.range_weight * l_range
            if use_gan and self.d_apply is not None:
                d_in = jnp.concatenate([packed[..., :256], chroma_coeffs],
                                       axis=-1)
                pred, _ = self.d_apply(d_vars, d_in, False)
                l_gan = L.gan_loss(cfg.gan_type, pred, True)
                m['l_g_gan'] = l_gan
                l = l + (cfg.gan_weight or 0.0) * l_gan
            m['l_g_total'] = l
            return l, (m, new_bn)
        (g_loss, (g_metrics, new_bn)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gc_params)
        lr_g = multistep_lr(cfg.lr_g, cfg.lr_steps, cfg.lr_gamma,
                            state.step)
        upd, gc_opt = self.g_tx.update(g_grads, state.gc_opt,
                                       state.gc_params)
        upd = jax.tree.map(lambda u: lr_g * u, upd)
        gc_params = optax.apply_updates(state.gc_params, upd)
        if new_bn is not None:
            gc_params = dict(gc_params, batch_stats=new_bn)
        metrics.update(g_metrics)
        return state.replace(gc_params=gc_params, gc_opt=gc_opt,
                             d_vars=d_vars, d_opt=d_opt, rng=rng,
                             step=state.step + 1), metrics
