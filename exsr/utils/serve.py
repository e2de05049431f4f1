"""Batch-bucketing policy for serving the flagship generator.

The v5e conv-efficiency cliff (CLAUDE.md; BENCH_CURVE.json) makes the
generator's forward time NON-monotonic in batch: a b64 forward takes
LONGER in absolute time than b128 (864 vs 792 ms measured r3), so a
serving layer that pads intermediate request sizes up to the next
*faster* bucket strictly wins.  ``best_bucket`` encodes that policy over
a measured time table; ``pad_batch`` zero-pads a request to the chosen
bucket (the pad rows ride along and are dropped by the caller).

The default table is measured on the TPU v5e at the headline bench shape
(4x SR, LR 128 -> HR 512, grouped bf16 trunk + fp32 CEM tail) by
``scripts_dev/probe_serve_pad.py``; re-run the probe to recalibrate on
other hardware.  VERDICT-r3 next #7.
"""
from __future__ import annotations

import bisect

import numpy as np

# batch -> measured ms per forward (scripts_dev/probe_serve_pad.py run
# 2026-08-20 on the real TPU v5e, LR 128 -> HR 512 grouped bf16 trunk +
# fp32 CEM tail, best-of-warm 8-rep scan; raw lines in
# artifacts/serve_pad_r5/probe.jsonl).  The non-monotonic cliff is real:
# b96 takes LONGER in absolute time than b128 (1254.8 vs 792.0 ms), so
# best_bucket pads 64/96-image requests up to 128 (+9% / +58% effective
# throughput); requests <= 48 run at their own size.
V5E_MS_PER_FWD: dict[int, float] = {
    8: 123.7,
    16: 232.8,
    32: 445.8,
    48: 644.4,
    64: 864.8,
    96: 1254.8,
    128: 792.0,
}

# Alternatives-batch compile buckets for the interactive edit path: the
# per-step cost of the compiled Z-edit program is dispatch-floor-bound
# (BENCH_EDIT: b8 costs ~7.5 ms/step/alt vs ~18 ms/step at b1 — padded
# candidate rows ride nearly free), so padding any requested alternatives
# count up to a few fixed buckets both reuses compiled programs across
# requests AND lowers the per-alternative cost.  GUI.py's random-
# alternatives browser analog (GUI.py:1740-1800).
ALT_BUCKETS: tuple[int, ...] = (1, 2, 4, 8, 16, 32)


def alt_bucket(n: int, buckets: tuple[int, ...] = ALT_BUCKETS) -> int:
    """Round an alternatives-batch request up to the next compile bucket
    (``n`` above the largest bucket is returned unchanged)."""
    for b in buckets:
        if b >= n:
            return b
    return n


def best_bucket(n: int, table: dict[int, float] | None = None) -> int:
    """Smallest-total-time execution bucket for a request of ``n`` images.

    Picks ``argmin_{B >= n} t(B)`` over the measured table — NOT simply
    the next bucket up: when a larger batch is absolutely faster (the
    cliff), the request jumps straight to it.  For ``n`` above the
    largest measured bucket, returns ``n`` (caller splits / runs as-is).
    """
    # None -> the measured default; an explicitly-empty dict stays empty
    # (identity policy) so callers can opt out of padding
    table = V5E_MS_PER_FWD if table is None else table
    if not table:
        return n
    buckets = sorted(table)
    if n > buckets[-1]:
        return n
    cands = buckets[bisect.bisect_left(buckets, n):]
    return min(cands, key=lambda b: table[b])


def pad_batch(arrays, n_to: int):
    """Zero-pad every array's leading (batch) axis to ``n_to`` rows.

    Returns (padded_arrays, n_real).  Zero rows are valid generator
    inputs (the CEM chain is shift-invariant), cost no extra compile,
    and the caller slices the first ``n_real`` outputs.
    """
    arrays = list(arrays)
    if not arrays:
        return arrays, 0
    n_real = int(arrays[0].shape[0])
    assert all(int(a.shape[0]) == n_real for a in arrays), \
        'mismatched batch axes'
    if n_to <= n_real:
        return arrays, n_real
    out = []
    for a in arrays:
        pad = np.zeros((n_to - n_real,) + tuple(a.shape[1:]), a.dtype)
        out.append(np.concatenate([np.asarray(a), pad], axis=0))
    return out, n_real
