"""Checkpoint / resume via Orbax.

The reference keeps joint model+optimizer .pth files per network with
filename-encoded steps, resume-by-max-step discovery, and pruned history
(base_model.py:114-140, SRRaGAN_model.py:732-776, utils/util.py:82-110).
Here the full train state — G/D params, both optimizer states, the
FilterLoss percentile reservoir, RNG, and step — is one Orbax pytree
checkpoint; retention (keep the most recent N, like prune_old_files) is
Orbax's CheckpointManager policy.  The rollback-on-instability path restores
the checkpoint nearest to ``step - steps_4_loss_std`` (update_learning_rate,
SRRaGAN_model.py:618-631).
"""
from __future__ import annotations

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True))

    def save(self, step: int, state, controller_state: dict | None = None,
             force: bool = False) -> bool:
        if step in self._mgr.all_steps():
            # e.g. the final forced save landing on a step the periodic
            # save already wrote (niter % ckpt_freq == 0) — orbax raises
            # StepAlreadyExistsError instead of overwriting
            return False
        args = {'state': ocp.args.StandardSave(state)}
        if controller_state is not None:
            args['controller'] = ocp.args.JsonSave(controller_state)
        return self._mgr.save(step, args=ocp.args.Composite(**args),
                              force=force)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def restore(self, state_template, step: int | None = None,
                with_controller: bool = False):
        step = self._mgr.latest_step() if step is None else step
        args = {'state': ocp.args.StandardRestore(state_template)}
        if with_controller:
            # a checkpoint without the controller item (older runs, or a
            # different CLI's layout) is expected; any OTHER metadata
            # failure must surface — silently restoring without the
            # controller would restart the schedule at step 0
            meta = self._mgr.item_metadata(step)
            try:
                has_ctl = 'controller' in meta
            except TypeError:
                has_ctl = 'controller' in (meta or {})
            if has_ctl:
                args['controller'] = ocp.args.JsonRestore()
            else:
                import warnings
                warnings.warn(
                    f'checkpoint step {step} has no controller item; '
                    'resuming with controller defaults')
                with_controller = False
                restored = self._mgr.restore(
                    step, args=ocp.args.Composite(**args))
                return restored['state'], None
        restored = self._mgr.restore(step, args=ocp.args.Composite(**args))
        if with_controller:
            return restored['state'], restored.get('controller')
        return restored['state']

    def restore_before(self, state_template, max_step: int):
        """Rollback: restore the newest checkpoint with step <= max_step
        (falls back to the oldest available)."""
        steps = self.all_steps()
        assert steps, 'no checkpoints available for rollback'
        eligible = [s for s in steps if s <= max_step]
        step = max(eligible) if eligible else min(steps)
        return step, self.restore(state_template, step)

    def restore_raw(self, step: int | None = None):
        """Template-free restore of the 'state' item as a raw nested dict
        of HOST numpy arrays (for tooling that extracts a sub-tree, e.g.
        export_g).  Restoring to numpy rather than the checkpoint's
        recorded shardings makes TPU-written checkpoints loadable on CPU
        ('Device TPU v5 lite0 was not found' otherwise)."""
        step = self._mgr.latest_step() if step is None else step
        path = f'{self._mgr.directory}/{step}/state'
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
