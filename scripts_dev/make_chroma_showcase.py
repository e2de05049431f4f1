"""Trained-chroma explorable-JPEG color showcase.

Drives JPEGEditSession end-to-end with a trained Y generator AND a trained
chroma generator (train_jpeg --chroma): opens an RGB image at a low QF,
renders (a) plain JPEG decode, (b) the explorable decode with
input-chroma recomposition, (c) the trained-chroma decode conditioned on
the EDITED Y (USE_Y_GENERATOR_4_CHROMA, DecompCNN_model.py:23,711-729),
and (d) the trained-chroma decode after a Y-space STD_increase edit —
showing the chroma model tracking the edited luma. Output:
artifacts/chroma_showcase/.

Usage:
  python scripts_dev/make_chroma_showcase.py \
      --y_ckpt experiments/convergence_jpeg_r3c/ckpt \
      --gc_ckpt experiments/chroma_r3/ckpt [--nf 320 --gc_nf 160] [--qf 10]
"""
import argparse
import os
import sys

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:          # runnable from any cwd
    sys.path.insert(0, ROOT)
FACE = '/root/reference/Samples/face_GT_HR.png'


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--y_ckpt', required=True)
    p.add_argument('--gc_ckpt', required=True)
    p.add_argument('--nf', type=int, default=320)
    p.add_argument('--nb', type=int, default=10)
    p.add_argument('--gc_nf', type=int, default=160)
    p.add_argument('--gc_nb', type=int, default=10)
    p.add_argument('--qf', type=int, default=10)
    p.add_argument('--image', default=FACE)
    p.add_argument('--out_dir', default=os.path.join(
        ROOT, 'artifacts', 'chroma_showcase'))
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from exsr.apps.jpeg_session import JPEGEditSession
    from exsr.train.checkpoints import CheckpointManager
    from exsr.models.convert import align_params_to

    os.makedirs(args.out_dir, exist_ok=True)
    img = np.asarray(Image.open(args.image).convert('RGB'),
                     np.float32) / 255.0
    h, w = (img.shape[0] // 16) * 16, (img.shape[1] // 16) * 16
    img = img[:h, :w]

    s = JPEGEditSession(nf=args.nf, nb=args.nb, qf=args.qf)
    # Y generator (trained)
    mgr = CheckpointManager(os.path.abspath(args.y_ckpt))
    raw = mgr.restore_raw(mgr.latest_step())
    template = dict(s.generator.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)),
        jnp.zeros((1, 8, 8, s.latent_channels))))
    s.load_params(jax.tree.map(jnp.asarray,
                               align_params_to(template,
                                               raw['g_params'])))
    s.open_image(img)

    # (a) plain JPEG decode for comparison
    plain = np.asarray(jnp.clip(s.codec.extract(
        s.comp, s._qf_arr()) / 255.0, 0, 1))[0, :, :, 0]
    # (b) explorable decode, input-chroma recomposition
    rgb_input_chroma = s.compose_rgb()
    # (c) trained-chroma decode at Z=0
    gmgr = CheckpointManager(os.path.abspath(args.gc_ckpt))
    graw = gmgr.restore_raw(gmgr.latest_step())
    s.attach_chroma(jax.tree.map(jnp.asarray, graw['gc_params']),
                    nf=args.gc_nf, nb=args.gc_nb)
    rgb_trained_chroma = s.compose_rgb()
    # (d) trained chroma tracking an edited Y
    s.optimize('STD_increase', data={'STD_increment': 0.03}, max_iters=30)
    rgb_edited = s.compose_rgb()

    def save(name, arr):
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, -1)
        Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, name))
        print('wrote', name)

    save('a_plain_jpeg_y.png', plain)
    save('b_explorable_input_chroma.png', rgb_input_chroma)
    save('c_explorable_trained_chroma.png', rgb_trained_chroma)
    save('d_trained_chroma_after_y_edit.png', rgb_edited)
    gt_y = np.asarray(s.y_image)[0, :, :, 0] / 255.0
    print('Y-PSNR plain %.2f dB' % (
        -10 * np.log10(np.mean((plain - gt_y) ** 2) + 1e-12)))
    dec_y = np.asarray(s.out)[0, :, :, 0]
    print('Y-PSNR decomp %.2f dB (post-edit)' % (
        -10 * np.log10(np.mean((dec_y - gt_y) ** 2) + 1e-12)))
    print('chroma mean |trained - input-chroma| = %.4f' % float(
        np.abs(rgb_trained_chroma - rgb_input_chroma).mean()))


if __name__ == '__main__':
    main()
