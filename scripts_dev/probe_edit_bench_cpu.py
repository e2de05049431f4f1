"""Root-cause probe for the r4 edit-bench 48-window anomaly (VERDICT-r4
weak #2 / next #2): replicate bench_edit.py's per-window flow on CPU with
a small generator and count how many of the 30 requested iterations
actually produce (non-NaN) losses — bench_edit divides wall time by that
count, so an edit that plateaus/reverts early inflates its per-step
number without the device being any slower."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from exsr.apps.session import EditSession

s = EditSession(scale=4, nb=1, edit_dtype=jnp.bfloat16,
                time_budget_s=1e9, rounds_per_launch=6)
s.init_random_params(0)
rng = np.random.default_rng(0)
img = rng.uniform(size=(256, 256, 3)).astype(np.float32)
s.open_image(img, is_hr=True)
H = 256
for win_lr in (16, 32, 48):
    w_hr = win_lr * 4
    y0 = (H - w_hr) // 2
    mask = np.zeros((H, H), np.float32)
    mask[y0:y0 + w_hr, y0:y0 + w_hr] = 1.0
    s.set_region(mask)
    desired = np.clip(np.asarray(s.sr) + 0.05, 0, 1)
    data = {'desired': desired}
    res = s.optimize('l1', data=data, max_iters=30)
    s.undo()
    res2 = s.optimize('l1', data=data, max_iters=30)
    s.undo()
    box = s._crop_box()
    print(f'win={win_lr} crop={box[1]-box[0]} '
          f'n_losses_warm={len(res["losses"])} '
          f'n_losses_measured={len(res2["losses"])} rounds={res2["rounds"]} '
          f'losses_head={np.round(res2["losses"][:8], 5).tolist()} '
          f'final={res2["final_loss"]:.5f}')
