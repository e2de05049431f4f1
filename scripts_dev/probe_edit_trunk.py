"""A/B: grouped-conv (fast_trunk) vs plain-concat trunk in the EDIT path.

The grouped decomposition (rrdb_fast) wins at throughput shapes by never
materializing the dense concat, but it issues MORE, SMALLER ops per RDB.
The edit loop is op-dispatch-bound (~6.5 ms of the 9.74 ms step is
shape-independent dispatch, PARITY.md), so the plain single-concat trunk
(fewer, larger ops) may invert the economics at 16-48 px LR crops.

Run on the TPU: python scripts_dev/probe_edit_trunk.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(fast_trunk: bool):
    import jax.numpy as jnp
    from exsr.apps.session import EditSession

    s = EditSession(scale=4, nb=23, edit_dtype=jnp.bfloat16,
                    time_budget_s=1e9, rounds_per_launch=6,
                    fast_trunk=fast_trunk)
    s.init_random_params(0)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(256, 256, 3)).astype(np.float32)
    s.open_image(img, is_hr=True)
    H = 256
    out = {}
    for win_lr in (16, 32, 48):
        w_hr = win_lr * 4
        y0 = (H - w_hr) // 2
        mask = np.zeros((H, H), np.float32)
        mask[y0:y0 + w_hr, y0:y0 + w_hr] = 1.0
        s.set_region(mask)
        desired = np.clip(np.asarray(s.sr) + 0.05, 0, 1)
        data = {'desired': desired}
        s.optimize('l1', data=data, max_iters=30)  # compile
        s.undo()
        t0 = time.perf_counter()
        res = s.optimize('l1', data=data, max_iters=30)
        e2e = (time.perf_counter() - t0) / max(len(res['losses']), 1)
        s.undo()
        out[win_lr] = round(e2e * 1e3, 2)
        print(json.dumps({'fast_trunk': fast_trunk, 'win_lr': win_lr,
                          'e2e_ms_per_step': out[win_lr]}), flush=True)
    return out


if __name__ == '__main__':
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    # Same-process A/B by default (one extra already-cached compile);
    # 'plain-only' skips the grouped-trunk leg and compares against the
    # committed BENCH_EDIT json — sensitive to machine/toolchain drift.
    if 'plain-only' in sys.argv[1:]:
        print('WARNING: baseline is the committed BENCH_EDIT json from a '
              'different run', flush=True)
    else:
        print(json.dumps({'fast': measure(True)}))
    print(json.dumps({'plain': measure(False)}))
