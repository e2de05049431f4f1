"""Z-edit latency benchmark (BASELINE.md north-star: <5 ms/edit-step).

Measures the session's actual compiled edit program — CEM-wrapped grouped
23-block generator forward+backward, masked-l1 objective, Adam-on-Z update,
accept/revert round logic — per step, at several edit-window sizes:

  * ``scan`` — the pure compiled loop (optimize_rounds warm relaunch),
    the per-step cost a long edit converges to;
  * ``e2e`` — a full EditSession.optimize call / its step count, which
    adds the final full-image recompute and host transfers (paid once per
    edit, so it shrinks as edits run longer).

Prints one JSON line per window size.  Run on the TPU: python bench_edit.py
"""
from __future__ import annotations

import json
import os
import sys
import time


REPEATS = 3


def _best_of(fn, n=REPEATS):
    """Min over n repeats + the raw samples.

    The r4 artifact recorded a single-shot 235.74 ms e2e at the 48-LR
    window vs 23.5 in r3 — a one-off stall (axon tunnel RPC variance
    reaches seconds, see training t_fetch logs) or a mid-measure
    recompile can poison a single sample; the steady-state cost the GUI
    user pays is the min.
    """
    samples = [fn() for _ in range(n)]
    return min(samples), [round(1000 * s, 2) for s in samples]


def main(out_path: str | None = None):
    import numpy as np
    import jax.numpy as jnp
    from exsr.apps.session import EditSession
    # fail fast (with a diagnostic) instead of hanging when the remote
    # TPU executor is wedged — see bench.py._watchdog
    from bench import _watchdog
    wd = _watchdog(300.0, metric='z_edit_step_latency', unit='ms')
    x = jnp.ones((64, 64))
    float((x @ x).mean())
    wd.cancel()
    out_path = out_path or (sys.argv[1] if len(sys.argv) > 1 else None)
    records = []

    s = EditSession(scale=4, nb=23, edit_dtype=jnp.bfloat16,
                    time_budget_s=1e9, rounds_per_launch=6)
    s.init_random_params(0)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(256, 256, 3)).astype(np.float32)
    s.open_image(img, is_hr=True)
    H = 256

    # focused re-measurement hooks: BENCH_EDIT_WINDOWS / _ALT_BUCKETS
    # select a subset (e.g. one window at a b32 alternatives batch)
    # without paying the full sweep's chip time; defaults reproduce the
    # committed BENCH_EDIT_r05 schema exactly
    windows = tuple(int(w) for w in os.environ.get(
        'BENCH_EDIT_WINDOWS', '16,32,48').split(','))
    buckets = tuple(int(b) for b in os.environ.get(
        'BENCH_EDIT_ALT_BUCKETS', '8,16').split(','))
    for win_lr in windows:
        w_hr = win_lr * 4
        y0 = (H - w_hr) // 2
        mask = np.zeros((H, H), np.float32)
        mask[y0:y0 + w_hr, y0:y0 + w_hr] = 1.0
        s.set_region(mask)
        desired = np.clip(np.asarray(s.sr) + 0.05, 0, 1)
        data = {'desired': desired}
        s.optimize('l1', data=data, max_iters=30)  # compile
        s.undo()

        def run_e2e():
            t0 = time.perf_counter()
            res = s.optimize('l1', data=data, max_iters=30)
            dt = (time.perf_counter() - t0) / max(len(res['losses']), 1)
            s.undo()
            return dt

        e2e, e2e_all = _best_of(run_e2e)

        # pure compiled loop: relaunch the cached round program directly
        key = [k for k in s._zopt_cache][-1]
        zo = s._zopt_cache[key]
        box = s._crop_box()
        yy0, yy1, xx0, xx1 = box
        sc = s.scale
        lr_crop = jnp.asarray(s.lr_image[:, yy0:yy1, xx0:xx1])
        z_crop = s.cur_z[:, yy0 * sc:yy1 * sc, xx0 * sc:xx1 * sc]
        mask_crop = mask[yy0 * sc:yy1 * sc, xx0 * sc:xx1 * sc]
        obj_args = {'lr': lr_crop,
                    'desired': jnp.asarray(
                        desired[:, yy0 * sc:yy1 * sc, xx0 * sc:xx1 * sc]),
                    'mask': jnp.asarray(mask_crop[None, :, :, None])}
        theta = jnp.asarray(np.arctanh(np.clip(z_crop, -1 + 1e-7,
                                               1 - 1e-7)))
        zo.optimize_rounds(theta, n_rounds=6, obj_args=obj_args)  # warm

        def run_scan():
            t0 = time.perf_counter()
            out = zo.optimize_rounds(theta, n_rounds=6, obj_args=obj_args)
            n = int(np.sum(~np.isnan(out[4])))
            return (time.perf_counter() - t0) / max(n, 1)

        scan, scan_all = _best_of(run_scan)
        # amortized cost per explored alternative: the GUI's alternatives
        # browser (GUI.py DisplayedImageSelection / random alternatives)
        # optimizes B latent candidates in ONE batched program, so the
        # per-alternative step cost divides the (dispatch-floor-bound)
        # per-step time by B (VERDICT r3 next #2a)
        per_alt = {}
        per_alt_all = {}
        for B_ALT in buckets:
            s.optimize('l1', data=data, max_iters=30,
                       n_alternatives=B_ALT)  # compile
            s.undo()

            def run_alt(B_ALT=B_ALT):
                t0 = time.perf_counter()
                res_b = s.optimize('l1', data=data, max_iters=30,
                                   n_alternatives=B_ALT)
                dt = (time.perf_counter() - t0) / max(
                    len(res_b['losses']), 1)
                s.undo()
                return dt

            e2e_b, alt_all = _best_of(run_alt)
            per_alt[B_ALT] = round(1000 * e2e_b / B_ALT, 2)
            per_alt_all[B_ALT] = alt_all

        rec = {
            'metric': 'z_edit_latency',
            'window_lr': win_lr,
            'crop_lr': int(lr_crop.shape[1]),
            'scan_ms_per_step': round(1000 * scan, 2),
            'e2e_ms_per_step': round(1000 * e2e, 2),
            'vs_target_5ms': round(1000 * scan / 5.0, 2),
            **{f'e2e_ms_per_step_per_alt_b{B}': per_alt[B]
               for B in buckets},
            'repeats': {'scan_ms': scan_all, 'e2e_ms': e2e_all,
                        **{f'e2e_ms_b{B}': per_alt_all[B]
                           for B in buckets}},
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    if out_path:
        # committed machine-readable history (VERDICT r2 weak #3: the
        # latency numbers lived only in PARITY prose)
        with open(out_path, 'w') as f:
            json.dump({'records': records}, f, indent=1)


if __name__ == '__main__':
    main()
