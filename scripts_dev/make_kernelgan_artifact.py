"""KernelGAN estimation-quality artifact (VERDICT-r3 next #4).

For 3 KNOWN anisotropic Gaussian x2 kernels (the degradation family of
the reference's KernelGAN/util.py gen_kernel), synthesize the LR image
from the face sample, run the FULL 3000-iteration estimation
(kernelgan/kernelgan.py — one lax.scan), and record:

  * recovered vs true kernel (PNG panel + npz),
  * centered-second-moment (covariance) relative error,
  * operator-action MAE: downscaling HR with the recovered kernel vs with
    the true kernel, against the bicubic-assumption baseline,
  * consistency of a CEM built from the recovered kernel on the synthetic
    pair — the property the GUI's estimated-kernel rebuild depends on
    (GUI.py:1587-1606).

Writes artifacts/kernelgan_r4/{summary.json, kernels.png, kernels.npz}.
Run on the TPU (default platform); CPU works too (slower).
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from PIL import Image

    from exsr.kernelgan.kernelgan import (KernelGAN, KernelGANConfig,
                                          aniso_gaussian_kernel,
                                          kernel_moments, BICUBIC_K8)

    out_dir = os.path.join(ROOT, 'artifacts', 'kernelgan_r4')
    os.makedirs(out_dir, exist_ok=True)

    img = np.asarray(Image.open(
        '/root/reference/Samples/face_GT_HR.png'))[:, :, :3] / 255.0
    hr = jnp.asarray(img.astype(np.float32)).transpose(2, 0, 1)[..., None]

    def action(k):
        """Downscale HR (per-channel) with kernel k, stride 2, VALID."""
        return np.asarray(jax.lax.conv_general_dilated(
            hr, jnp.asarray(np.asarray(k, np.float32))[:, :, None, None],
            (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')))[..., 0]

    cases = [
        ('iso_mild', dict(size=13, sig1=1.2, sig2=1.2, theta=0.0)),
        ('aniso', dict(size=13, sig1=2.0, sig2=0.8, theta=0.6)),
        ('aniso_steep', dict(size=13, sig1=2.6, sig2=0.6, theta=2.2)),
    ]
    bic = np.zeros((13, 13))
    bic[2:10, 2:10] = BICUBIC_K8

    summary = {'what': __doc__.split('\n')[0],
               'iters': 3000, 'cases': []}
    panels = {}
    for name, kw in cases:
        k_true = aniso_gaussian_kernel(kw['size'], kw['sig1'], kw['sig2'],
                                       kw['theta'], sf=2)
        lr_img = action(k_true).transpose(1, 2, 0)
        kg = KernelGAN(KernelGANConfig(max_iters=3000), seed=0)
        k_rec = np.asarray(kg.estimate(lr_img))

        _, cov_t = kernel_moments(k_true)
        _, cov_r = kernel_moments(k_rec)
        cov_rel = float(np.abs(cov_r - cov_t).max() / np.abs(cov_t).max())

        # operator action vs the bicubic assumption (interior crop)
        def emb(k):
            size = max(k_true.shape[0], k.shape[0])
            size += (size - k.shape[0]) % 2
            p = size - k.shape[0]
            kk = np.pad(k, p // 2) if p else k
            p2 = size - k_true.shape[0]
            kt = np.pad(k_true, p2 // 2) if p2 else k_true
            return kk, kt
        k_r_e, k_t_e = emb(k_rec)
        a_t, a_r = action(k_t_e), action(k_r_e)
        k_b_e, _ = emb(bic)
        a_b = action(k_b_e)
        m = a_t.shape[1] - 8
        mae_rec = float(np.abs(a_t[:, 4:m, 4:m] - a_r[:, 4:m, 4:m]).mean())
        mae_bic = float(np.abs(a_t[:, 4:m, 4:m] - a_b[:, 4:m, 4:m]).mean())

        # CEM rebuilt from the recovered kernel keeps the synthetic pair
        # consistent (the GUI rebuild path)
        from exsr.cem.cem import CEM, CEMConf
        cem = CEM.create(CEMConf(scale_factor=2),
                         upscale_kernel=np.asarray(k_rec, np.float64))
        filt = cem.device_filters(3)
        hr_n = jnp.asarray(img.astype(np.float32))[None, :256, :256]
        from exsr.cem.cem import consistent_downsample
        lr_n = consistent_downsample(
            hr_n, filt, cem.ds_kernel_invalidity_half_size_lr)
        enforced = filt.enforce(lr_n, hr_n * 0.9 + 0.05)
        lr_back = consistent_downsample(
            enforced, filt, cem.ds_kernel_invalidity_half_size_lr)
        mlr = cem.invalidity_margins_lr
        sl = (slice(None), slice(mlr, -mlr or None),
              slice(mlr, -mlr or None))
        cons = float(jnp.abs(lr_back[sl] - lr_n[sl]).max())

        rec = {'case': name, 'true': kw, 'cov_rel_err': round(cov_rel, 4),
               'action_mae_recovered': round(mae_rec, 6),
               'action_mae_bicubic_assumption': round(mae_bic, 6),
               'action_improvement_x': round(mae_bic / max(mae_rec, 1e-12),
                                             2),
               'cem_rebuild_consistency_max': cons}
        summary['cases'].append(rec)
        panels[name] = (np.asarray(k_true), k_rec)
        print(json.dumps(rec), flush=True)

    # PNG panel: true | recovered per case
    cell = 96
    canvas = np.zeros((len(cases) * cell, 2 * cell))
    for i, (name, (kt, kr)) in enumerate(panels.items()):
        for j, k in enumerate((kt, kr)):
            kk = k / k.max()
            im = np.asarray(Image.fromarray(
                (kk * 255).astype(np.uint8)).resize((cell, cell),
                                                    Image.NEAREST))
            canvas[i * cell:(i + 1) * cell, j * cell:(j + 1) * cell] = im
    Image.fromarray(canvas.astype(np.uint8)).save(
        os.path.join(out_dir, 'kernels.png'))
    np.savez(os.path.join(out_dir, 'kernels.npz'),
             **{f'{n}_{t}': k for n, (kt, kr) in panels.items()
                for t, k in (('true', kt), ('recovered', kr))})
    with open(os.path.join(out_dir, 'summary.json'), 'w') as f:
        json.dump(summary, f, indent=1)
    print('wrote', out_dir)


if __name__ == '__main__':
    main()
