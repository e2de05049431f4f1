"""CheckpointManager behaviors (orbax wrapper)."""
import jax.numpy as jnp
import numpy as np

from exsr.train.checkpoints import CheckpointManager


def test_duplicate_step_save_is_noop(tmp_path):
    """niter % ckpt_freq == 0 makes the final forced save land on a step
    the periodic save already wrote — must be a no-op, not
    StepAlreadyExistsError (seen live in train_jpeg)."""
    mgr = CheckpointManager(str(tmp_path / 'ck'), save_interval_steps=1)
    state = {'w': jnp.arange(4.0)}
    assert mgr.save(4, state, force=True) is True
    mgr.wait()
    assert mgr.save(4, state, force=True) is False  # duplicate: skipped
    restored = mgr.restore({'w': jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(restored['w']),
                               [0, 1, 2, 3])
    mgr.close()
