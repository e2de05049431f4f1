"""Regenerate tests/golden/reference_cem.npz from the reference code.

Runs the ORIGINAL reference implementation (read-only mount at
/root/reference) and records its outputs so the exsr numeric layer can be
bit-compared against them without the reference present.  Provenance for
every array in the golden file:

  lr_input/hr_input       deterministic inputs (seeded RNG below)
  up{2,3,4}/down{2,4}     imresize_CEM.imresize (imresize_CEM.py:8-87)
  ds_kernel_<s>           CEMnet.Return_kernel  (CEMnet.py:364)
  inv_hth_<s>             CEMnet.compute_inv_hTh (CEMnet.py:186-206)
  margins_<s>             [ds_margin, inv_hth_margin, invalidity_margins_LR]
                          (CEMnet.py:30-49)
  dt_upscale_<s>          CEMnet.DT_Satisfying_Upscale (CEMnet.py:60-64)
  proj_ortho_<s>          CEMnet.Project_2_ortho_2_NS (CEMnet.py:156-160)

Usage (needs the reference mount; the shipped .npz was produced this way):

    python tests/golden/generate_reference_cem.py [out.npz]

The reference targets an old scipy: ``scipy.signal.gaussian`` moved to
``scipy.signal.windows.gaussian``, shimmed below before import.
"""
import sys

import numpy as np

REFERENCE = '/root/reference/codes'


def main(out_path=None):
    out_path = out_path or __file__.replace(
        'generate_reference_cem.py', 'reference_cem.npz')
    # --- environment shims for the aged reference code
    import scipy.signal
    if not hasattr(scipy.signal, 'gaussian'):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    sys.path.insert(0, REFERENCE)
    from CEM import CEMnet
    from CEM.imresize_CEM import imresize

    # reuse the committed inputs when regenerating, so output arrays stay
    # directly comparable across scipy/numpy versions; fresh inputs are
    # drawn only when building a golden file from scratch
    try:
        prev = dict(np.load(out_path))
    except FileNotFoundError:
        prev = {}

    def an_input(name, shape, seed):
        if name in prev and prev[name].shape == shape:
            return prev[name]
        return np.random.RandomState(seed).uniform(size=shape)

    lr_input = an_input('lr_input', (20, 20, 3), 0)
    hr_input = an_input('hr_input', (24, 24, 3), 1)
    out = {'lr_input': lr_input, 'hr_input': hr_input}

    for f in (2, 3, 4):
        out[f'up{f}'] = imresize(lr_input, scale_factor=[float(f)])
    for f in (2, 4):
        out[f'down{f}'] = imresize(hr_input, scale_factor=[1.0 / f])

    for s in (2, 4):
        conf = CEMnet.Get_CEM_Conf(s)
        net = CEMnet.CEMnet(conf)
        out[f'ds_kernel_{s}'] = net.ds_kernel
        out[f'inv_hth_{s}'] = net.inv_hTh
        out[f'margins_{s}'] = np.array([
            net.ds_kernel_invalidity_half_size_LR,
            net.inv_hTh_invalidity_half_size,
            net.invalidity_margins_LR])
        lr_small = an_input(f'lr_small_{s}', (12, 12, 3), s)
        hr_big = an_input(f'hr_big_{s}', (12 * s, 12 * s, 3), s + 10)
        out[f'lr_small_{s}'] = lr_small
        out[f'hr_big_{s}'] = hr_big
        out[f'dt_upscale_{s}'] = net.DT_Satisfying_Upscale(lr_small)
        out[f'proj_ortho_{s}'] = net.Project_2_ortho_2_NS(hr_big)

    np.savez(out_path, **out)
    print(f'wrote {out_path}: {sorted(out)}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else None)
