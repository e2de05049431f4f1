"""Z-space optimizer — the edit engine, as one jitted lax.scan.

The reference's Z_optimizer (Z_optimization.py:328-797) re-runs an un-jitted
full generator forward+backward per Adam step from Python.  Here the whole
edit loop — Z reparameterization, generator forward, objective, backward,
Adam update, min-loss-Z tracking — is a single compiled ``lax.scan`` over
steps: one device launch per ``optimize()`` call, no host round-trips.

Faithful semantics:
  * Z = z_range * tanh(pre_tanh_z); frozen-region masking blends optimized
    and initial pre-tanh Z (Optimizable_Z, Z_optimization.py:273-306);
  * Adam on Z only, generator parameters frozen (constants baked into the
    compiled graph — Manage_Model_Grad_Requirements, :637-645);
  * the minimum-loss Z across iterations is returned, not the last
    (:755-762);
  * negative ``max_iters`` means "iterate until the loss plateaus, capped at
    5x|max_iters|" (:663-670) — realized as chunked scans with a host-side
    plateau check (the loss history is a device array; one sync per chunk);
  * random re-initialization for diverse alternatives uses the xavier-uniform
    gain-100 convention (:308-313);
  * non-local editing adds an L1 constraint holding the image outside the
    mask at its initial value (:386-390, 743-746).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from exsr.utils.compile import tuned_jit

MIN_LR = 1e-5  # Z_optimization.py:329


def atanh_init(z: jnp.ndarray, z_range: float) -> jnp.ndarray:
    """Map an existing Z into pre-tanh space (Z_optimization.py:336-340)."""
    eps = jnp.finfo(z.dtype).eps
    r = jnp.clip(z / z_range, -1 + eps, 1 - eps)
    return jnp.arctanh(r)


def xavier_uniform_like(key: jax.Array, z: jnp.ndarray, gain: float = 100.0
                        ) -> jnp.ndarray:
    """torch.nn.init.xavier_uniform_(z, gain=100) on a [B, H, W, C] map
    (torch computes fans on [B, C, h, w]: fan_in = C*h*w, fan_out = B*h*w)."""
    b, h, w, c = z.shape
    fan_in, fan_out = c * h * w, b * h * w
    a = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, z.shape, z.dtype, -a, a)


@dataclasses.dataclass(frozen=True)
class ZOptimizer:
    """Compiled Z-space optimizer for one (objective, shape) pair.

    ``forward_fn(z) -> out``: the frozen CEM-wrapped generator, closed over
    params and the LR input.  ``objective_fn(out, z) -> scalar``.
    """
    forward_fn: Callable
    objective_fn: Callable
    lr: float = 0.1            # GUI default (GUI.py:51-62)
    z_range: float = 1.0

    def __post_init__(self):
        # learning rate is a TRACED argument (adam direction scaled at
        # apply time) so LR decay between rounds reuses the compiled scan —
        # a rebuild-per-decay would recompile the whole edit graph
        object.__setattr__(self, '_opt', optax.chain(
            optax.scale_by_adam(), optax.scale(-1.0)))
        object.__setattr__(self, '_run', tuned_jit(
            self._run_impl, static_argnames=('n_steps',)))
        object.__setattr__(self, '_run_rounds', tuned_jit(
            self._run_rounds_impl,
            static_argnames=('n_rounds', 'iters_per_round', 'lr_decay',
                             'min_lr')))

    def init_state(self, pre_tanh_z: jnp.ndarray):
        return self._opt.init(pre_tanh_z)

    def _effective(self, theta, z_mask, frozen_theta):
        if z_mask is None:
            return theta
        return z_mask * theta + (1.0 - z_mask) * frozen_theta

    def _run_impl(self, theta, opt_state, z_mask, frozen_theta, lr,
                  obj_args, n_steps):
        def loss_of(theta):
            eff = self._effective(theta, z_mask, frozen_theta)
            z = self.z_range * jnp.tanh(eff)
            if obj_args is None:
                return self.objective_fn(self.forward_fn(z), z)
            # edit data (LR crop, desired image, masks) flows through
            # traced arguments so repeated edits with new data reuse the
            # compiled scan
            out = self.forward_fn(z, obj_args)
            return self.objective_fn(out, z, obj_args)

        grad_fn = jax.value_and_grad(loss_of)

        def step(carry, _):
            theta, opt_state, best_loss, best_theta = carry
            loss, g = grad_fn(theta)
            updates, opt_state = self._opt.update(g, opt_state)
            updates = jax.tree.map(lambda u: lr * u, updates)
            new_theta = optax.apply_updates(theta, updates)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_theta = jax.tree.map(
                lambda bt, t: jnp.where(better, t, bt), best_theta, theta)
            return (new_theta, opt_state, best_loss, best_theta), loss

        init = (theta, opt_state, jnp.inf, theta)
        (theta, opt_state, best_loss, best_theta), losses = jax.lax.scan(
            step, init, None, length=n_steps)
        return theta, opt_state, best_loss, best_theta, losses

    def _run_rounds_impl(self, theta, z_mask, frozen_theta, lr0, obj_args,
                         n_rounds, iters_per_round, lr_decay, min_lr):
        """The GUI's whole mini-epoch loop as ONE compiled program
        (GUI.py:2043-2134): per round of ``iters_per_round`` Adam steps,
        accept the round when its final loss improved on the best seen,
        otherwise revert Z to the best, reset Adam, and divide the LR by
        ``lr_decay``; rounds after LR < ``min_lr`` pass through.  One
        device launch per ``n_rounds`` — amortizes the per-launch tunnel
        latency that dominates small interactive edits."""
        def loss_of(theta):
            eff = self._effective(theta, z_mask, frozen_theta)
            z = self.z_range * jnp.tanh(eff)
            if obj_args is None:
                return self.objective_fn(self.forward_fn(z), z)
            out = self.forward_fn(z, obj_args)
            return self.objective_fn(out, z, obj_args)

        grad_fn = jax.value_and_grad(loss_of)
        opt_state0 = self._opt.init(theta)

        def round_body(carry, _):
            theta, opt_state, best_loss, best_theta, lr, active = carry

            def step(c, _):
                th, st = c
                loss, g = grad_fn(th)
                updates, st = self._opt.update(g, st)
                updates = jax.tree.map(lambda u: lr * u, updates)
                return (optax.apply_updates(th, updates), st), loss

            (new_theta, new_opt), losses = jax.lax.scan(
                step, (theta, opt_state), None, length=iters_per_round)
            improved = losses[-1] < best_loss

            def sel(a, b):
                return jax.tree.map(
                    lambda x, y: jnp.where(improved, x, y), a, b)
            # frozen rounds (LR exhausted) keep everything as-is
            def keep(new, old):
                return jax.tree.map(
                    lambda x, y: jnp.where(active, x, y), new, old)
            theta_n = keep(sel(new_theta, best_theta), theta)
            opt_n = keep(sel(new_opt, self._opt.init(best_theta)),
                         opt_state)
            best_loss_n = jnp.where(active & improved, losses[-1],
                                    best_loss)
            best_theta_n = keep(sel(new_theta, best_theta), best_theta)
            lr_n = jnp.where(active & ~improved, lr / lr_decay, lr)
            active_n = active & (lr_n >= min_lr)
            losses = jnp.where(active, losses, jnp.nan)
            return (theta_n, opt_n, best_loss_n, best_theta_n, lr_n,
                    active_n), losses

        init = (theta, opt_state0, jnp.inf, theta,
                jnp.float32(lr0), jnp.bool_(True))
        (theta, _, best_loss, best_theta, lr, _), losses = jax.lax.scan(
            round_body, init, None, length=n_rounds)
        # the final Z materializes inside the same launch: each eager op
        # after the scan would cost a full tunnel roundtrip
        eff = self._effective(best_theta, z_mask, frozen_theta)
        z = self.z_range * jnp.tanh(eff)
        return z, best_theta, best_loss, lr, losses.reshape(-1)

    def optimize_rounds(self, pre_tanh_z: jnp.ndarray, n_rounds: int,
                        iters_per_round: int = 5, lr: float | None = None,
                        z_mask: jnp.ndarray | None = None,
                        frozen_theta: jnp.ndarray | None = None,
                        lr_decay: float = 5.0, min_lr: float = MIN_LR,
                        obj_args=None):
        """Chunked-round edit: returns (z, best_theta, best_loss, final_lr,
        losses[n_rounds*iters_per_round], NaN-padded after early stop)."""
        if frozen_theta is None:
            frozen_theta = pre_tanh_z
        z, best_theta, best_loss, lr_out, losses = self._run_rounds(
            pre_tanh_z, z_mask, frozen_theta,
            jnp.float32(self.lr if lr is None else lr), obj_args,
            n_rounds=n_rounds, iters_per_round=iters_per_round,
            lr_decay=lr_decay, min_lr=min_lr)
        return (z, best_theta, float(best_loss), float(lr_out),
                np.asarray(losses))

    def optimize(self, pre_tanh_z: jnp.ndarray, max_iters: int,
                 opt_state=None, z_mask: jnp.ndarray | None = None,
                 frozen_theta: jnp.ndarray | None = None,
                 use_min_loss_z: bool = True,
                 lr: float | None = None, obj_args=None):
        """Run the edit loop; returns (z, pre_tanh_z, opt_state, losses).

        ``max_iters`` < 0 runs in plateau mode: chunks of |max_iters| steps
        until relative improvement < 1e-2 * lr, capped at 5 chunks
        (Z_optimization.py:663-670).  ``lr`` overrides the constructor LR
        without recompiling.
        """
        cur_lr = self.lr if lr is None else lr
        theta = pre_tanh_z
        if opt_state is None:
            opt_state = self.init_state(theta)
        if frozen_theta is None:
            frozen_theta = theta
        all_losses = []
        best = (np.inf, theta)
        if max_iters > 0:
            chunks, chunk_len = 1, max_iters
        else:
            chunks, chunk_len = 5, -max_iters
        for c in range(chunks):
            theta, opt_state, best_loss, best_theta, losses = self._run(
                theta, opt_state, z_mask, frozen_theta,
                jnp.float32(cur_lr), obj_args, n_steps=chunk_len)
            losses = np.asarray(losses)
            all_losses.extend(losses.tolist())
            if float(best_loss) < best[0]:
                best = (float(best_loss), best_theta)
            if max_iters < 0 and c > 0:
                ref = all_losses[max_iters]
                if (ref - all_losses[-1]) / (abs(ref) + 1e-30) \
                        < 1e-2 * self.lr:
                    break
        final_theta = best[1] if (use_min_loss_z
                                  and best[0] <= all_losses[-1]) else theta
        eff = self._effective(final_theta, z_mask, frozen_theta)
        z = self.z_range * jnp.tanh(eff)
        return z, final_theta, opt_state, np.asarray(all_losses)
