"""CLI tooling smoke tests (exsr/apps/scripts.py)."""
import os

import numpy as np
import pytest
from PIL import Image

from exsr.apps import scripts


def _write_png(path, arr01):
    Image.fromarray((np.clip(arr01, 0, 1) * 255).astype(np.uint8)
                    ).save(path)


def test_results_2_video(tmp_path):
    d = tmp_path / 'val_images'
    d.mkdir()
    rng = np.random.default_rng(0)
    for step in (100, 20, 3):
        _write_png(str(d / f'{step}_PSNR21.3.png'),
                   rng.uniform(size=(32, 32, 3)))
    _write_png(str(d / 'collage.png'), rng.uniform(size=(32, 32, 3)))
    out = str(tmp_path / 'video.gif')
    scripts.main(['results_2_video', '--images_dir', str(d),
                  '--out', out, '--fps', '2', '--blink_seconds', '2'])
    frames = Image.open(out)
    # sorted steps + blink tail; PIL merges consecutive duplicate GIF
    # frames (extending duration), so the tail may collapse
    assert 5 <= frames.n_frames <= 3 + 2 * 2


def test_fft_comparison_single_and_ratio(tmp_path):
    a, b = tmp_path / 'a', tmp_path / 'b'
    a.mkdir(), b.mkdir()
    rng = np.random.default_rng(1)
    # folder A: sharp (white noise) vs folder B: blurred copies
    for i in range(3):
        img = rng.uniform(size=(40, 40, 3))
        _write_png(str(a / f'im{i}_SR.png'), img)
        blur = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
                + np.roll(img, -1, 0)) / 4
        _write_png(str(b / f'im{i}_other.png'), blur)
    out1 = str(tmp_path / 'spec_single.npz')
    scripts.main(['fft_comparison', '--folder_a', str(a), '--out', out1])
    d = np.load(out1)
    assert d['mean_log_spectrum'].shape == (40, 40)
    assert d['n_images'] == 3
    assert os.path.exists(str(tmp_path / 'spec_single.png'))

    out2 = str(tmp_path / 'spec_ratio.npz')
    scripts.main(['fft_comparison', '--folder_a', str(a),
                  '--folder_b', str(b), '--out', out2])
    spec = np.load(out2)['mean_log_spectrum']
    # sharp/blur log-ratio must favor A at high frequencies: the corner
    # of the unshifted spectrum (Nyquist) is strongly positive
    assert spec[20, 20] > spec[0, 0]


def test_transfer_files(tmp_path):
    from exsr.apps.scripts import main as scripts_main
    src = tmp_path / 'src'
    src.mkdir()
    (src / 'a_s00.png').write_bytes(b'x')
    (src / 'b_s00_LR.png').write_bytes(b'y')
    (src / 'c_other.png').write_bytes(b'z')
    dst = tmp_path / 'dst'
    scripts_main(['transfer_files', '--source_dir', str(src),
                  '--target_dir', str(dst)])
    assert sorted(p.name for p in dst.iterdir()) == ['a_s00.png',
                                                     'b_s00_LR.png']
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        scripts_main(['transfer_files', '--source_dir', str(src),
                      '--target_dir', str(dst)])


def test_extract_subimages(tmp_path):
    """Sliding-grid sub-image cropper actually runs through its process
    pool (the worker must be picklable) and honors the edge threshold
    (extract_subimgs_single.py semantics)."""
    import numpy as np
    from PIL import Image
    src = tmp_path / 'src'
    src.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.uniform(size=(100, 140, 3)) * 255).astype(
        'uint8')).save(src / 'a.png')
    Image.fromarray((rng.uniform(size=(40, 40, 3)) * 255).astype(
        'uint8')).save(src / 'small.png')  # below crop size: skipped
    out = tmp_path / 'out'
    from exsr.apps.scripts import extract_subimages
    extract_subimages(str(src), str(out), crop_size=64, step=32,
                      threshold=8, workers=2)
    files = sorted(os.listdir(out))
    assert files and all(f.startswith('a_s') for f in files)
    arr = np.asarray(Image.open(out / files[0]))
    assert arr.shape == (64, 64, 3)
    # grid: rows [0,32] (edge gap 4 <= threshold), cols [0,32,64,76]
    assert len(files) == 8


def test_export_g_bridges_train_state_to_eval_layout(tmp_path):
    """export_g: full TRAIN-state ckpt -> {'g_params'} ckpt loadable by
    the eval/web/session consumers (reference ships per-net .pth files,
    base_model.py save_network; our train state is one joint pytree)."""
    import numpy as np
    import jax.numpy as jnp
    from exsr.train.checkpoints import CheckpointManager

    g = {'conv': {'kernel': jnp.arange(12.0).reshape(3, 4),
                  'bias': jnp.zeros(4)}}
    state = {'g_params': g,
             'd_params': {'w': jnp.ones(3)},
             'opt_g': {'mu': jnp.zeros(2)},
             'step': jnp.int32(7)}
    src = tmp_path / 'train_ckpt'
    mgr = CheckpointManager(str(src))
    mgr.save(7, state, force=True)
    mgr.wait()

    out = tmp_path / 'g_only'
    from exsr.apps.scripts import main as scripts_main
    scripts_main(['export_g', '--train_ckpt', str(src),
                  '--out', str(out)])

    dst = CheckpointManager(str(out))
    restored = dst.restore({'g_params': g})
    np.testing.assert_array_equal(
        np.asarray(restored['g_params']['conv']['kernel']),
        np.arange(12.0).reshape(3, 4))
    assert set(restored) == {'g_params'}


def test_psnr_ssim_folder_table(tmp_path):
    """psnr_ssim subcommand: MATLAB-compatible folder-vs-folder table
    (metrics/calculate_PSNR_SSIM.py:12-92) — Y-only + border crop, Gen
    matched by basename with optional suffix."""
    from PIL import Image
    rng = np.random.default_rng(0)
    gt_dir, gen_dir = tmp_path / 'gt', tmp_path / 'gen'
    gt_dir.mkdir()
    gen_dir.mkdir()
    for i in range(2):
        img = (rng.uniform(size=(32, 32, 3)) * 255).astype('uint8')
        noisy = np.clip(img.astype(int)
                        + rng.integers(-8, 8, img.shape), 0,
                        255).astype('uint8')
        Image.fromarray(img).save(gt_dir / f'im{i}.png')
        Image.fromarray(noisy).save(gen_dir / f'im{i}_x4.png')
    from exsr.apps.scripts import psnr_ssim
    mp, ms = psnr_ssim(str(gt_dir), str(gen_dir), crop=4, y_only=True,
                       suffix='_x4')
    assert 20 < mp < 50 and 0 < ms <= 1
    # RGB mode, no crop, exact match -> infinite PSNR, SSIM 1
    mp2, ms2 = psnr_ssim(str(gt_dir), str(gt_dir), crop=0)
    assert np.isinf(mp2) and ms2 > 0.999
