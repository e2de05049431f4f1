"""Headline benchmark: 4x SR throughput on 128x128 LR inputs (img/s/chip).

Baseline target (BASELINE.md): > 200 img/s/chip on TPU v5e with the full
23-block CEM-wrapped explorable generator.  Prints ONE JSON line (the best
batch point), preceded by the batch->throughput curve on stderr.

Uses the grouped-conv inference path (exsr/models/rrdb_fast.py): identical
math to the canonical RRDBNet (tests/test_rrdb_fast.py) restructured so
each residual-dense block runs five wide-output convs instead of five
32-wide ones — ~1.5x end-to-end on the v5e MXU.

Measurement note: on the axon-tunneled platform ``block_until_ready`` does
not reliably synchronize with device execution, so the timed region chains
N forwards inside one jitted scan and fetches a dependent scalar — the wall
time provably covers all N executions.
"""
from __future__ import annotations

import json
import sys
import time


def _watchdog(seconds: float, metric: str = 'sr4x_throughput_128px',
              unit: str = 'img/s/chip'):
    """Emit an honest failure line and exit if the backend never comes up.

    A killed-mid-compile TPU job can wedge the remote executor so that
    every subsequent device op hangs forever (see
    .claude/skills/verify/SKILL.md); a hung bench is worse than a failed
    one, so a daemon timer aborts with a diagnostic JSON line unless the
    device probe finishes in time.  The timer is cancelled before the
    first (legitimately slow) big compile starts.
    """
    import threading

    def boom():
        import os
        note = ''
        try:  # point at the last committed measurement (clearly labeled)
            curve = json.load(open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                'BENCH_CURVE.json')))
            best = max(p['img_per_s'] for p in curve['curve'])
            note = (f'; last committed measurement: {best} img/s '
                    '(BENCH_CURVE.json)')
        except Exception:
            pass
        print(json.dumps({
            'metric': metric, 'value': 0.0,
            'unit': unit, 'vs_baseline': 0.0,
            'error': f'device probe unresponsive after {seconds:.0f}s '
                     f'(wedged TPU executor?){note}'}), flush=True)
        os._exit(2)
    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main():
    import os

    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.models.rrdb_fast import (pack_grouped_params,
                                       rrdbnet_apply_fast)

    # Persistent executable cache: the remote TPU compile of the batch-128
    # program takes minutes (and the helper occasionally 500s on a cold
    # build) — cache hits make repeat runs fast and deterministic.
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '.jax_cache_tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    LR_SIZE = 128
    SCALE = 4
    N_ITERS = 8

    # tiny device probe under a watchdog: a wedged remote executor hangs
    # every op forever — fail fast with a diagnostic instead
    wd = _watchdog(300.0)
    x = jnp.ones((64, 64))
    float((x @ x).mean())
    wd.cancel()

    cem = CEM.create(CEMConf(scale_factor=SCALE))
    filt = cem.device_filters(3)  # separable 1-D CEM filter chain
    g = RRDBNet(nb=23, latent_channels=3)
    lr1 = jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32)
    z1 = jnp.zeros((1, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), lr1, z1)
    packed = pack_grouped_params(params)

    # bf16 trunk (params cast on the fly): the CEM chain downstream stays
    # fp32, so the consistency guarantee is unaffected by compute dtype
    def g_apply(pk, x, zz):
        return rrdbnet_apply_fast(None, x, zz, packed=pk,
                                  dtype=jnp.bfloat16)

    wrapped = cem_wrap(g_apply, filt, upscale=SCALE)

    best = None
    curve = []
    # Conv efficiency on the v5e rises sharply with total rows (N*H*W):
    # measured 67 img/s at batch<=96 but ~160 img/s at batch 128 — sweep
    # the large-batch regime (144+ OOMs/crashes on the 512^2 tail at 16G
    # HBM).  Raising the scoped-VMEM budget deepens conv pipelining:
    # measured 150 -> 161 img/s at b128 (plateau at 64-112 MiB).
    compiler_opts = {'xla_tpu_scoped_vmem_limit_kib': '81920'}
    for batch in (32, 64, 128):
        lr = jnp.zeros((batch, LR_SIZE, LR_SIZE, 3), jnp.float32)
        z = jnp.zeros((batch, LR_SIZE * SCALE, LR_SIZE * SCALE, 3),
                      jnp.float32)

        def run_n(pk, lr, z):
            def body(carry, _):
                out = jnp.clip(wrapped(pk, lr + 0.0 * carry, z,
                                       cem.invalidity_margins_lr,
                                       pre_pad=False), 0.0, 1.0)
                return out.mean(), None
            final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=N_ITERS)
            return final

        try:
            lowered = jax.jit(run_n).lower(packed, lr, z)
            try:
                fn = lowered.compile(compiler_options=compiler_opts)
            except Exception:  # backend without this flag: default opts
                fn = lowered.compile()
            float(fn(packed, lr, z))  # warm
            t0 = time.perf_counter()
            float(fn(packed, lr, z))  # dependent-scalar fetch = sync
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM at large batch: stop the sweep
            print(f'batch {batch}: {type(e).__name__}', file=sys.stderr)
            break
        imgs = batch * N_ITERS / dt
        print(f'batch {batch}: {imgs:.1f} img/s '
              f'({1000 * dt / N_ITERS:.1f} ms/fwd)', file=sys.stderr)
        curve.append({'batch': batch, 'img_per_s': round(imgs, 1),
                      'ms_per_fwd': round(1000 * dt / N_ITERS, 1)})
        if best is None or imgs > best[1]:
            best = (batch, imgs)

    # committed machine-readable sweep history (diffable across rounds)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'BENCH_CURVE.json'), 'w') as f:
            json.dump({'curve': curve, 'best_batch': best[0]}, f, indent=1)
    except OSError:
        pass
    print(json.dumps({
        'metric': 'sr4x_throughput_128px',
        'value': round(best[1], 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(best[1] / 200.0, 3),
    }))


if __name__ == '__main__':
    main()
