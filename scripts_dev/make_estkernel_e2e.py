"""Close the estimated-kernel loop END-TO-END (VERDICT-r4 next #5).

The pieces each exist and are individually validated (KernelGAN quality:
artifacts/kernelgan_r4; `eval_sr --kernel estimated`; session
`estimate_kernel`) — this script produces the missing artifact: the full
GUI story on known non-bicubic degradations, with TRAINED weights.

For each known anisotropic-Gaussian ×4 degradation (the kernelgan_r4
family at sf=4):
  1. synthesize LR = consistent_downsample(GT, CEM(k_true)) — the
     ground-truth degradation operator;
  2. path A (bicubic assumption): SR with the bicubic CEM — what a user
     gets ignoring the true kernel (test.py default);
  3. path B (estimated): KernelGAN ×2 estimate from the LR image →
     analytic ×4 composition → CEM rebuilt with it (the GUI's
     Change_kernel_in_use flow, GUI.py:1587-1606; test.py:143-148);
  4. path C (oracle): CEM built from k_true — the upper bound.

Per path: PSNR/SSIM vs GT and TRUE-OPERATOR consistency — MAE between
downscale(SR, k_true) and the LR actually given (the fidelity the CEM
guarantee is FOR; under a wrong kernel the guarantee binds SR to the
wrong operator, so this is where the estimated kernel must win).

Generator: the r5 flagship-width trained export (nb=23 nf=64, Z=0) —
the r4 run50k2 export did not survive the VM reset, and the flagship
export is the stronger deployment story anyway.
Writes artifacts/estkernel_e2e_r5/summary.json (+SR PNGs).
Run on the TPU; ~2 min/KernelGAN estimation + forwards.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

CASES = [
    ('iso_mild', dict(size=13, sig1=1.2, sig2=1.2, theta=0.0)),
    ('aniso', dict(size=13, sig1=2.0, sig2=0.8, theta=0.6)),
    ('aniso_steep', dict(size=13, sig1=2.6, sig2=0.6, theta=2.2)),
]
# Generator checkpoint: configurable because every trained export so far
# (r4 run50k2, r5 flagship) has been destroyed by VM resets before this
# script could run — ESTK_CKPT/ESTK_NB/ESTK_NF point it at whatever
# export the current session managed to train; provenance is recorded in
# the summary.
CKPT = os.environ.get(
    'ESTK_CKPT', os.path.join(ROOT, 'experiments/run_flagship_r5/g_export'))
NB = int(os.environ.get('ESTK_NB', '23'))
NF = int(os.environ.get('ESTK_NF', '64'))
PROVENANCE = os.environ.get('ESTK_PROVENANCE', 'r5 flagship-width export')


def main():
    import jax
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    iters = 3000
    for a in sys.argv[1:]:
        if a.isdigit():
            iters = int(a)
    import jax.numpy as jnp
    from PIL import Image
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    from exsr.cem.cem import CEM, CEMConf, consistent_downsample
    from exsr.kernelgan.kernelgan import (KernelGAN, KernelGANConfig,
                                          aniso_gaussian_kernel,
                                          analytic_x4_kernel)
    from exsr.apps.eval_sr import build_model
    from exsr.utils.metrics import calculate_psnr, calculate_ssim, \
        crop_border
    from exsr.utils.color import tensor2img

    out_dir = os.path.join(ROOT, 'artifacts', 'estkernel_e2e_r5')
    os.makedirs(out_dir, exist_ok=True)
    img = np.asarray(Image.open(
        '/root/reference/Samples/face_GT_HR.png'))[:276, :276, :3] / 255.0
    hr = jnp.asarray(img.astype(np.float32))[None]
    gt8 = tensor2img(np.asarray(hr))

    summary = {'what': __doc__.split('\n')[0], 'ckpt': CKPT,
               'generator': {'nb': NB, 'nf': NF,
                             'provenance': PROVENANCE},
               'kernelgan_iters': iters, 'cases': []}
    for name, kw in CASES:
        k_true = aniso_gaussian_kernel(kw['size'], kw['sig1'], kw['sig2'],
                                       kw['theta'], sf=4)
        cem_true = CEM.create(CEMConf(scale_factor=4),
                              upscale_kernel=k_true)
        filt_true = cem_true.device_filters(3)
        lr = consistent_downsample(
            hr, filt_true, cem_true.ds_kernel_invalidity_half_size_lr)
        lr_np = np.asarray(lr)

        kg = KernelGAN(KernelGANConfig(max_iters=iters), seed=0)
        k2 = np.asarray(kg.estimate(lr_np[0]))
        k_est = analytic_x4_kernel(k2)

        rec = {'case': name, 'true': kw, 'paths': {}}
        for path, kern in (('bicubic_assumed', None),
                           ('kernelgan_estimated', k_est),
                           ('true_kernel_oracle', k_true)):
            cem_i, fwd = build_model(4, nb=NB, nf=NF, latent_channels=3,
                                     checkpoint=CKPT, upscale_kernel=kern)
            zh = (lr_np.shape[1] * 4, lr_np.shape[2] * 4)
            sr = fwd(lr_np, np.zeros((1, zh[0], zh[1], 3), np.float32))
            sr8 = tensor2img(sr)
            # true-operator consistency: downscale the SR with the REAL
            # degradation and compare to the given LR (interior crop)
            down = np.asarray(consistent_downsample(
                jnp.asarray(sr), filt_true,
                cem_true.ds_kernel_invalidity_half_size_lr))
            m = max(int(cem_true.invalidity_margins_lr),
                    int(cem_i.invalidity_margins_lr), 1)
            cons = float(np.abs(down - lr_np)[:, m:-m, m:-m].mean())
            b = 4
            rec['paths'][path] = {
                'psnr': round(calculate_psnr(
                    crop_border(sr8.astype(np.float64), b),
                    crop_border(gt8.astype(np.float64), b)), 3),
                'ssim': round(calculate_ssim(
                    crop_border(sr8.astype(np.float64), b),
                    crop_border(gt8.astype(np.float64), b)), 4),
                'true_operator_consistency_mae': cons,
            }
            Image.fromarray(sr8).save(
                os.path.join(out_dir, f'{name}_{path}.png'))
            print(json.dumps({'case': name, 'path': path,
                              **rec['paths'][path]}), flush=True)
        a = rec['paths']['bicubic_assumed']['true_operator_consistency_mae']
        e = rec['paths']['kernelgan_estimated'][
            'true_operator_consistency_mae']
        rec['estimated_vs_assumed_consistency_x'] = round(a / e, 2)
        summary['cases'].append(rec)
    with open(os.path.join(out_dir, 'summary.json'), 'w') as f:
        json.dump(summary, f, indent=1)
    print('wrote', out_dir)


if __name__ == '__main__':
    main()
