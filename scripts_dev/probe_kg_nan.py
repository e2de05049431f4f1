"""Find the NaN onset in the TPU KernelGAN estimation (iso_mild case of
make_kernelgan_artifact.py crashed in post-processing with an all-NaN
kernel at 3000 iters). Sweeps max_iters and reports raw-kernel stats
BEFORE post-processing."""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from exsr.kernelgan.kernelgan import (KernelGAN, KernelGANConfig,
                                          aniso_gaussian_kernel,
                                          generator_kernel)

    img = np.asarray(Image.open(
        '/root/reference/Samples/face_GT_HR.png'))[:, :, :3] / 255.0
    hr = jnp.asarray(img.astype(np.float32)).transpose(2, 0, 1)[..., None]
    k_true = aniso_gaussian_kernel(13, 1.2, 1.2, 0.0, sf=2)
    lr = jax.lax.conv_general_dilated(
        hr, jnp.asarray(np.asarray(k_true, np.float32))[:, :, None, None],
        (2, 2), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    lr_img = np.asarray(lr)[..., 0].transpose(1, 2, 0)

    for iters in (250, 500, 1000, 1500, 2000, 3000):
        kg = KernelGAN(KernelGANConfig(max_iters=iters), seed=0)
        try:
            k = np.asarray(kg.estimate(lr_img))
            print(f'iters={iters}: post-processed finite='
                  f'{np.isfinite(k).all()} sum={k.sum():.4f}', flush=True)
        except Exception as e:
            # re-run to grab the RAW kernel (pre-post-process)
            kg2 = KernelGAN(KernelGANConfig(max_iters=iters), seed=0)
            g_vars = kg2.estimate_raw_vars(lr_img) \
                if hasattr(kg2, 'estimate_raw_vars') else None
            print(f'iters={iters}: CRASH {type(e).__name__}: {e}',
                  flush=True)


if __name__ == '__main__':
    main()
