"""Run the REFERENCE KernelGAN (torch, /root/reference — imported
read-only, nothing copied) on the same synthetic known-kernel input as
artifacts/kernelgan_r4, to calibrate what kernel-recovery accuracy the
original implementation itself achieves.  The exsr test threshold for
covariance recovery should reflect the reference's own accuracy, not an
aspirational bound.

Writes /tmp/ref_kg_baseline.json (referenced from the artifact summary).

Run: python scripts_dev/ref_kernelgan_baseline.py  (CPU torch; ~minutes)
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, '/root/reference/codes')

import numpy as np


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from PIL import Image
    from exsr.kernelgan.kernelgan import (aniso_gaussian_kernel,
                                          kernel_moments)

    img = np.asarray(Image.open(
        '/root/reference/Samples/face_GT_HR.png'))[:, :, :3] / 255.0
    hr = jnp.asarray(img.astype(np.float32)).transpose(2, 0, 1)[..., None]

    def action(k):
        return np.asarray(jax.lax.conv_general_dilated(
            hr, jnp.asarray(np.asarray(k, np.float32))[:, :, None, None],
            (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')))[..., 0]

    name, kw = 'aniso', dict(size=13, sig1=2.0, sig2=0.8, theta=0.6)
    k_true = aniso_gaussian_kernel(kw['size'], kw['sig1'], kw['sig2'],
                                   kw['theta'], sf=2)
    lr_img = action(k_true).transpose(1, 2, 0)

    # CPU shim: the reference hardcodes .cuda() everywhere; this image's
    # torch is CPU-only. Map every cuda call to a no-op/CPU equivalent.
    import torch
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.is_available = lambda: False
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # the reference predates numpy 1.20's alias removal (util.py uses
    # np.int in kernel_shift)
    np.int = int
    np.float = float

    from KernelGAN.configs import Config
    from KernelGAN.train import train as ref_train
    conf = Config().parse([])
    conf.LR_image = (np.clip(lr_img, 0, 1) * 255.0)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else conf.max_iters
    conf.max_iters = iters
    k_ref = np.asarray(ref_train(conf), np.float64)

    _, cov_t = kernel_moments(k_true)
    _, cov_r = kernel_moments(k_ref / k_ref.sum())
    cov_rel = float(np.abs(cov_r - cov_t).max() / np.abs(cov_t).max())

    def emb(k, size):
        p = size - k.shape[0]
        return np.pad(k, (p // 2, p - p // 2))
    size = max(k_true.shape[0], k_ref.shape[0]) | 1
    a_t = action(emb(k_true, size + (size - k_true.shape[0]) % 2)
                 if (size - k_true.shape[0]) % 2 else emb(k_true, size))
    a_r = action(emb(k_ref, size + (size - k_ref.shape[0]) % 2)
                 if (size - k_ref.shape[0]) % 2 else emb(k_ref, size))
    m = a_t.shape[1] - 8
    mae = float(np.abs(a_t[:, 4:m, 4:m] - a_r[:, 4:m, 4:m]).mean())
    out = {'case': name, 'iters': iters, 'cov_rel_err': round(cov_rel, 4),
           'action_mae_recovered': round(mae, 6),
           'kernel_sum': float(k_ref.sum())}
    print(json.dumps(out), flush=True)
    with open('/tmp/ref_kg_baseline.json', 'w') as f:
        json.dump(out, f)


if __name__ == '__main__':
    main()
