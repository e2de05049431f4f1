"""Small utilities mirroring utils/util.py odds and ends."""
from __future__ import annotations

import numpy as np


def receptive_field(apply_fn, input_shape, out_pos=None) -> int:
    """Numerical receptive-field size of a conv network — the gradient
    footprint of one output pixel (base_model.py:70-111 / util.py:414-445,
    computed there by probing; here via one jax.grad)."""
    import jax
    import jax.numpy as jnp
    x = jnp.zeros(input_shape)
    h_out = None

    def center_out(x):
        out = apply_fn(x)
        oy = out.shape[1] // 2 if out_pos is None else out_pos[0]
        ox = out.shape[2] // 2 if out_pos is None else out_pos[1]
        return out[0, oy, ox].sum()

    g = np.asarray(jax.grad(center_out)(x))[0]
    footprint = np.abs(g).sum(-1) > 0
    rows = np.flatnonzero(footprint.any(1))
    cols = np.flatnonzero(footprint.any(0))
    if rows.size == 0:
        return 0
    return int(max(rows[-1] - rows[0] + 1, cols[-1] - cols[0] + 1))


def varying_weight(step, steps, values, legitimate_range=None):
    """Piecewise-linear scheduled loss weight (utils/util.py:170-185)."""
    steps = np.asarray(steps, np.float64)
    values = np.asarray(values, np.float64)
    w = float(np.interp(step, steps, values))
    if legitimate_range is not None:
        w = float(np.clip(w, *legitimate_range))
    return w


def im_to_z_input(image: np.ndarray, size_hw: tuple[int, int],
                  z_range: float = 1.0,
                  single_channel: bool = False) -> np.ndarray:
    """Turn an arbitrary image into a Z input map — resize to the target
    size, min-max normalize into [-z_range, z_range], then smooth with a
    5x5 edge-padded box filter (util.py Convert_Im_2_Zinput:234-247).
    Returns [H, W, C] float32."""
    from scipy.ndimage import uniform_filter, zoom
    img = np.asarray(image, np.float64)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1 and not single_channel:
        img = np.repeat(img, 3, axis=-1)
    factors = (size_hw[0] / img.shape[0], size_hw[1] / img.shape[1], 1)
    img = zoom(img, factors, order=1)[:size_hw[0], :size_hw[1]]
    if single_channel:
        img = img.mean(2, keepdims=True)
    # tolerance, not >0: bilinear zoom leaves ~1e-18 noise on constant
    # images which min-max normalization would blow up to full range
    if img.max() - img.min() > 1e-9:
        img = ((img - img.min()) / (img.max() - img.min())
               * 2 * z_range - z_range)
        # 'nearest' boundary == the reference's edge-pad + valid conv
        img = uniform_filter(img, size=(5, 5, 1), mode='nearest')
    else:
        img = img * 2 * z_range - z_range
    return img.astype(np.float32)


def z_map_to_png(z: np.ndarray) -> np.ndarray:
    """Encode a [-1, 1] 3-channel Z map as a uint8 image for portable
    save/load (the GUI stores Z as PNG — GUI.py:2633-2686,
    util.py Convert_Im_2_Zinput:234)."""
    assert z.ndim == 3 and z.shape[-1] == 3
    return np.round((np.clip(z, -1, 1) + 1.0) * 127.5).astype(np.uint8)


def png_to_z_map(img: np.ndarray) -> np.ndarray:
    """Inverse of :func:`z_map_to_png` (quantized to 1/127.5)."""
    return img.astype(np.float32) / 127.5 - 1.0


def min_outliers_threshold(scores: np.ndarray, labels: np.ndarray) -> float:
    """Decision threshold minimizing misclassified samples between two
    score populations (util.Min_Outliers_Threshold — used for the JPEG D's
    'correctly distinguished' statistic, DecompCNN_model.py:607-608)."""
    order = np.argsort(scores)
    s, lab = scores[order], labels[order]
    # candidates between consecutive scores; count errors for each split
    pos_total = (lab > 0).sum()
    neg_cum = np.cumsum(lab < 0)
    pos_cum = np.cumsum(lab > 0)
    errors = (pos_cum + ((lab < 0).sum() - neg_cum))
    i = int(np.argmin(errors))
    return float(s[i]) if i < len(s) - 1 else float(s[-1])


def overlap_normalized_autocorr(x: np.ndarray) -> np.ndarray:
    """Mean-subtracted full autocorrelation divided by the per-lag overlap
    count, positive lags only (GUI.py:506-512)."""
    x = np.asarray(x, np.float64) - np.mean(x)
    result = np.correlate(x, x, mode='full')
    normalizer = np.arange(1, x.size + 1)
    normalizer = np.concatenate([normalizer, normalizer[-2::-1]])
    return (result / normalizer)[x.size:]


def first_autocorr_peak(ac: np.ndarray, min_value: float = 1e-3):
    """Index of the first local autocorrelation maximum above ``min_value``
    (scipy.signal.find_peaks semantics for the simple no-options call used
    at GUI.py:521-526), or None."""
    for i in range(1, len(ac) - 1):
        if ac[i] > ac[i - 1] and ac[i] > ac[i + 1] and ac[i] > min_value:
            return i
    return None


def bilinear_sample_line(img: np.ndarray, y0: float, x0: float,
                         y1: float, x1: float, n: int) -> np.ndarray:
    """Sample a grayscale image bilinearly at n points along a segment."""
    ys = np.linspace(y0, y1, n)
    xs = np.linspace(x0, x1, n)
    h, w = img.shape
    yc = np.clip(ys, 0, h - 1)
    xc = np.clip(xs, 0, w - 1)
    iy = np.clip(np.floor(yc).astype(int), 0, h - 2)
    ix = np.clip(np.floor(xc).astype(int), 0, w - 2)
    fy, fx = yc - iy, xc - ix
    return ((1 - fy) * (1 - fx) * img[iy, ix]
            + (1 - fy) * fx * img[iy, ix + 1]
            + fy * (1 - fx) * img[iy + 1, ix]
            + fy * fx * img[iy + 1, ix + 1])


def resize_scribble_image(image: np.ndarray, dsize) -> np.ndarray:
    """Continuous-valued resize to (h, w) — ResizeScribbleImage
    (utils/util.py:310-316, INTER_AREA): antialiased linear resampling."""
    if tuple(image.shape[:2]) == tuple(dsize):
        return image
    import jax
    shape = tuple(dsize) + tuple(image.shape[2:])
    return np.asarray(jax.image.resize(image.astype(np.float32), shape,
                                       'linear', antialias=True))


def resize_categorical_image(image: np.ndarray, dsize,
                             inclusive: bool = False) -> np.ndarray:
    """Categorical (mask/label) resize — ResizeCategorialImage
    (utils/util.py:293-308): per-category linear resampling with
    thresholding; ``inclusive`` marks every partly-touched pixel ON; lower
    categories overrule higher ones on overlap."""
    assert np.issubdtype(image.dtype, np.integer), 'non-categorical input'
    if tuple(image.shape[:2]) == tuple(dsize):
        return image
    import jax
    out = np.zeros(tuple(dsize), image.dtype)
    cats = sorted(set(image.reshape(-1).tolist()))[::-1]
    if inclusive:
        cats = [c for c in cats if c != 0]
    for c in cats:
        r = np.asarray(jax.image.resize(
            (image == c).astype(np.float32), tuple(dsize), 'linear',
            antialias=False))
        m = r > (0.0 if inclusive else 0.5)
        out = np.where(m, np.asarray(c, image.dtype), out)
    return out


def scribble_mask_components(scribble_mask: np.ndarray, mask: np.ndarray,
                             brightness: float):
    """Shared scribble-target pieces (Z_optimization.py:409-423): the
    3x3-smeared brightness multiplier (classes 2/3), the L1 mask over
    drawn-stroke classes 1-3, and one mask per TV-region id (>3) —
    used by both the SR and the JPEG (Y-channel) scribble flows."""
    from scipy.signal import convolve2d
    mult = np.ones_like(scribble_mask, np.float32)
    mult += brightness * (scribble_mask == 2).astype(np.float32)
    mult -= brightness * (scribble_mask == 3).astype(np.float32)
    k = np.ones((3, 3)) / 9.0
    mult = convolve2d(np.pad(mult, 1, mode='edge'), k, 'valid')
    l1_mask = (mask * ((scribble_mask > 0) & (scribble_mask < 4))) \
        .astype(np.float32)
    tv_ids = [i for i in np.unique(scribble_mask * mask) if i > 3]
    tv_masks = [(mask * (scribble_mask == i)).astype(np.float32)
                for i in tv_ids]
    return mult, l1_mask, tv_masks


def fetch_scalars(metrics) -> dict:
    """Fetch a dict of device scalars as host floats in ONE transfer.

    Converting per-step training metrics with ``float(v)`` per entry costs
    one device round-trip each — on a tunneled backend that was measured
    at ~97% of a small-config train-step's wall time (the device step
    itself enqueues in ~24 ms).  Stacking the scalars device-side first
    (one eager op) turns ~10 round-trips into one.  Non-scalar entries
    are passed through untouched.
    """
    import jax.numpy as jnp
    keys = [k for k, v in metrics.items()
            if getattr(v, 'ndim', np.ndim(v)) == 0]
    if not keys:
        return dict(metrics)
    stacked = np.asarray(jnp.stack([jnp.asarray(metrics[k], jnp.float32)
                                    for k in keys]))
    out = {k: float(x) for k, x in zip(keys, stacked)}
    for k, v in metrics.items():
        if k not in out:
            out[k] = v
    return out


def stage_scalars(metrics):
    """Begin an async one-transfer fetch of a dict of device scalars.

    Device-side: stacks the scalar entries into one array (a single
    enqueued op) and starts its host copy (``copy_to_host_async``), so a
    later :func:`read_scalars` overlaps the tunnel round-trip with
    whatever the caller enqueues in between — the pipelined-metrics
    pattern the train CLIs use (enqueue step t+1, then read step t).
    """
    import jax.numpy as jnp
    keys = [k for k, v in metrics.items()
            if getattr(v, 'ndim', np.ndim(v)) == 0]
    stacked = None
    if keys:
        stacked = jnp.stack([jnp.asarray(metrics[k], jnp.float32)
                             for k in keys])
        try:
            stacked.copy_to_host_async()
        except AttributeError:
            pass
    rest = {k: v for k, v in metrics.items() if k not in set(keys)}
    return keys, stacked, rest


def read_scalars(staged) -> dict:
    """Materialize a :func:`stage_scalars` handle into host floats."""
    keys, stacked, rest = staged
    out = dict(rest)
    if keys:
        vals = np.asarray(stacked)
        out.update({k: float(x) for k, x in zip(keys, vals)})
    return out


def install_sigint_stop():
    """Turn the first SIGINT into a cooperative stop request.

    Training CLIs are deadline-stopped with ``timeout --signal=INT``;
    the default KeyboardInterrupt unwinds straight past the forced
    final checkpoint save, losing up to ``ckpt_freq`` steps of work
    (the round-5 JPEG run lost its entire deadline-capped state this
    way — only the step-1 checkpoint survived the SIGINT).  The
    installed handler records the request and restores the previous
    handler, so a second SIGINT still hard-interrupts a stuck run.

    Returns a zero-arg callable the train loop polls at its top; its
    ``.restore()`` puts the previous handler back (trainers call it
    after the loop so in-process callers — tests, ``apps.scripts``
    pipelines — don't inherit an altered SIGINT).
    """
    import signal

    flag = {'stop': False}
    prev = signal.getsignal(signal.SIGINT)

    def _handler(signum, frame):
        flag['stop'] = True
        signal.signal(signal.SIGINT, prev)
        print('SIGINT: stopping at the next step boundary '
              '(send again to hard-interrupt)', flush=True)

    class _Stop:
        def __call__(self):
            return flag['stop']

        @staticmethod
        def restore():
            signal.signal(signal.SIGINT, prev)

    signal.signal(signal.SIGINT, _handler)
    return _Stop()
