"""End-to-end CLI drives of eval_sr / eval_jpeg on tiny models (CPU).

Reference counterparts: codes/test.py (SR batch eval: PSNR/SSIM,
consistency, diversity std; :218-287) and test_JPEG.py.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(192, 192, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f'im{i}.png')
    return str(d)


def test_eval_sr_cli(img_dir, tmp_path):
    from exsr.apps import eval_sr
    out = str(tmp_path / 'out')
    eval_sr.main(['--hr_dir', img_dir, '--scale', '4', '--nb', '1',
                  '--num_z', '3', '--out_dir', out, '--save_images',
                  '--save_std_map'])
    summary = json.load(open(os.path.join(out, 'summary.json')))['summary']
    assert summary['num_images'] == 2
    assert np.isfinite(summary['avg_psnr'])
    assert np.isfinite(summary['avg_ssim'])
    # CEM guarantee holds through the CLI path
    assert summary['avg_consistency_mae'] < 1e-3
    assert summary['avg_per_pixel_std'] >= 0
    assert os.path.exists(os.path.join(out, 'im0_SR.png'))
    # per-pixel diversity heatmap (normalized std across the Z samples)
    sm = np.asarray(Image.open(os.path.join(out, 'im0_STDmap.png')))
    assert sm.shape == (192, 192) and sm.max() == 255


def test_eval_sr_latent_sweep_stats(img_dir, tmp_path):
    """Per-channel uniform sweep scores PSNR at the 0-valued sample and
    reports the GT-vs-SR high-frequency STD stats (test.py:101-113,
    218-236,281-287)."""
    from exsr.apps import eval_sr
    out = str(tmp_path / 'sweep')
    s = eval_sr.main(['--hr_dir', img_dir, '--nb', '1', '--num_z', '3',
                      '--latent', 'uniform_sweep', '--latent_channel', '1',
                      '--max_images', '1', '--out_dir', out])
    assert np.isfinite(s['avg_psnr'])
    assert s['avg_hr_std'] > 0
    assert s['avg_sr_high_freq_std'] >= 0
    assert s['avg_per_pixel_std'] >= 0
    # the sweep includes the 0 sample in the middle
    vals = eval_sr.sweep_values('uniform_sweep', 3)
    assert vals == [-1.0, 0.0, 1.0]
    gvals = eval_sr.sweep_values('gaussian_sweep', 3)
    assert gvals[1] == 0.0 and gvals[0] == -gvals[2]


def test_eval_sr_unit_circle_and_z_image(img_dir, tmp_path):
    """UnitCircle theta sweep (test.py:125-128) and Z-from-image mode
    (util.py Convert_Im_2_Zinput:234)."""
    from exsr.apps import eval_sr
    out = str(tmp_path / 'uc')
    s = eval_sr.main(['--hr_dir', img_dir, '--nb', '1', '--num_z', '2',
                      '--latent', 'unit_circle', '--max_images', '1',
                      '--out_dir', out])
    assert s['avg_per_pixel_std'] >= 0
    zim = tmp_path / 'zmap.png'
    rng = np.random.default_rng(3)
    Image.fromarray((rng.uniform(size=(32, 32, 3)) * 255)
                    .astype(np.uint8)).save(zim)
    out2 = str(tmp_path / 'zi')
    s2 = eval_sr.main(['--hr_dir', img_dir, '--nb', '1',
                       '--latent', 'z_image', '--z_image', str(zim),
                       '--max_images', '1', '--out_dir', out2])
    assert np.isfinite(s2['avg_psnr'])


def test_eval_sr_optimizer_modes(img_dir, tmp_path):
    """desired_im / max_std eval-time Z-optimization (test.py:183-192):
    Z is optimized per image before scoring."""
    from exsr.apps import eval_sr
    out = str(tmp_path / 'des')
    s = eval_sr.main(['--hr_dir', img_dir, '--nb', '1',
                      '--latent', 'desired_im', '--num_z_iters', '2',
                      '--max_images', '1', '--out_dir', out])
    assert np.isfinite(s['avg_psnr'])
    assert np.isfinite(s['avg_final_loss'])
    out2 = str(tmp_path / 'mstd')
    s2 = eval_sr.main(['--hr_dir', img_dir, '--nb', '1',
                       '--latent', 'max_std', '--num_z_iters', '2',
                       '--max_images', '1', '--out_dir', out2])
    assert np.isfinite(s2['avg_final_loss'])
    # consistency still holds after the optimized-Z forward
    assert s2['avg_consistency_mae'] < 1e-3


def test_eval_sr_plain_esrgan_arch(img_dir, tmp_path):
    """test_esrgan.json-style eval: CEM_arch=0 + latent_input='None' runs
    the plain Z-less ESRGAN without the CEM wrap (no consistency
    guarantee, so the metric is omitted); sr_resnet dispatches
    MSRResNet/SRResNet (test_esrgan_Feat.json)."""
    import json as _json
    from exsr.apps import eval_sr
    opt = {
        'name': 'e', 'model': 'srragan', 'scale': 4,
        'datasets': {'test_1': {'name': 's', 'mode': 'LRHR',
                                'dataroot_HR': img_dir,
                                'dataroot_LR': None}},
        'path': {'root': str(tmp_path)},
        'network_G': {'which_model_G': 'RRDB_net', 'CEM_arch': 0,
                      'latent_input': 'None', 'latent_channels': 0,
                      'nf': 8, 'nb': 1, 'in_nc': 3, 'out_nc': 3, 'gc': 4},
    }
    p = tmp_path / 'e.json'
    p.write_text(_json.dumps(opt))
    out = str(tmp_path / 'oe')
    s = eval_sr.main(['--opt', str(p), '--out_dir', out,
                      '--max_images', '1'])
    assert np.isfinite(s['avg_psnr'])
    assert 'avg_consistency_mae' not in s   # no CEM -> no guarantee
    # MSRResNet variant
    opt['network_G'] = {'which_model_G': 'MSRResNet', 'DTE_arch': 0,
                        'latent_input': 'None', 'latent_channels': 0,
                        'nf': 8, 'nb': 2, 'in_nc': 3, 'out_nc': 3}
    p2 = tmp_path / 'e2.json'
    p2.write_text(_json.dumps(opt))
    out2 = str(tmp_path / 'oe2')
    s2 = eval_sr.main(['--opt', str(p2), '--out_dir', out2,
                       '--max_images', '1'])
    assert np.isfinite(s2['avg_psnr'])


def test_im_to_z_input():
    """Resize + minmax-normalize + 5x5 edge box smooth
    (util.py:234-247)."""
    from exsr.utils.misc import im_to_z_input
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(24, 20, 3)).astype(np.float32)
    z = im_to_z_input(img, (48, 40), z_range=1.0)
    assert z.shape == (48, 40, 3)
    assert z.min() >= -1.0 - 1e-6 and z.max() <= 1.0 + 1e-6
    # constant image skips normalization: 0.5 -> 0
    z2 = im_to_z_input(np.full((8, 8, 3), 0.5, np.float32), (16, 16))
    assert np.allclose(z2, 0.0, atol=1e-6)


def test_eval_jpeg_cli(img_dir, tmp_path):
    from exsr.apps import eval_jpeg
    out = str(tmp_path / 'outj')
    eval_jpeg.main(['--data_dir', img_dir, '--qf', '10', '--nf', '16',
                    '--nb', '3', '--out_dir', out, '--num_z', '3',
                    '--z_sweep_gif', '2', '--save_images'])
    summary = json.load(open(os.path.join(out, 'summary.json')))['summary']
    assert np.isfinite(summary['avg_psnr_jpeg'])
    assert np.isfinite(summary['avg_psnr_decomp'])
    # random-Z diversity sweep (test_JPEG.py:135-140)
    assert summary['avg_per_pixel_std'] >= 0
    # Z-sweep GIF export (test_JPEG.py TEST_TYPE='GIF')
    assert any(f.endswith('_Zsweep.gif') for f in os.listdir(out))
    # per-image decodes saved (test_JPEG.py save_img path)
    assert any(f.endswith('_jpeg.png') for f in os.listdir(out))
    assert any(f.endswith('_decomp.png') for f in os.listdir(out))


def test_eval_jpeg_optimizer_latent(img_dir, tmp_path):
    """JPEG eval-time Z-optimization toward the uncompressed Y
    (test_JPEG.py:124-158 latent modes)."""
    from exsr.apps import eval_jpeg
    out = str(tmp_path / 'outjd')
    s = eval_jpeg.main(['--data_dir', img_dir, '--qf', '10', '--nf', '16',
                        '--nb', '3', '--out_dir', out, '--max_images', '1',
                        '--latent', 'desired_im', '--num_z_iters', '2'])
    assert np.isfinite(s['avg_psnr_decomp'])
    assert np.isfinite(s['avg_final_loss'])


def test_eval_sr_reference_opt(img_dir, tmp_path):
    """`--opt` accepts a reference test_sr.json-style config and fills
    scale/nb/data roots (test.py:47-73 vocabulary)."""
    import json as _json
    opt = {
        'name': 'x', 'model': 'sr', 'scale': 4,
        'datasets': {'test_1': {'name': 's', 'mode': 'LRHR',
                                'dataroot_HR': img_dir,
                                'dataroot_LR': None}},
        'path': {'root': str(tmp_path)},
        # latent_input must be declared: options.py defaults it to 'None'
        # which (faithfully) collapses latent_channels to 0 — a Z-less
        # generator has no Z sweep
        'network_G': {'which_model_G': 'RRDB_net', 'nf': 64, 'nb': 1,
                      'in_nc': 3, 'out_nc': 3, 'gc': 32,
                      'latent_input': 'all_layers', 'latent_channels': 3},
    }
    p = tmp_path / 'topt.json'
    p.write_text(_json.dumps(opt))
    from exsr.apps import eval_sr
    out = str(tmp_path / 'o')
    eval_sr.main(['--opt', str(p), '--out_dir', out, '--max_images', '1',
                  '--z_sweep_gif', '2'])
    summary = _json.load(open(os.path.join(out, 'summary.json')))['summary']
    assert summary['num_images'] == 1
    # Z-channel sweep exported as an animated GIF (test.py:289-319)
    assert os.path.exists(os.path.join(out, 'im0_Zsweep.gif'))


REFERENCE_TEST_OPTS = '/root/reference/codes/options/test'


@pytest.mark.skipif(not os.path.isdir(REFERENCE_TEST_OPTS),
                    reason='reference tree not mounted')
def test_eval_sr_real_reference_configs(img_dir, tmp_path):
    """The actual reference test JSONs drive eval_sr end-to-end: the
    explorable test_sr.json keeps the CEM guarantee, test_esrgan_Feat.json
    dispatches its CEM-less sr_resnet generator (no consistency metric —
    nothing to guarantee)."""
    from exsr.apps import eval_sr
    s = eval_sr.main(['--opt', f'{REFERENCE_TEST_OPTS}/test_sr.json',
                      '--hr_dir', img_dir, '--nb', '1',
                      '--out_dir', str(tmp_path / 'o1'),
                      '--max_images', '1'])
    assert s['avg_consistency_mae'] < 1e-3
    s2 = eval_sr.main(['--opt',
                       f'{REFERENCE_TEST_OPTS}/test_esrgan_Feat.json',
                       '--hr_dir', img_dir, '--nb', '1',
                       '--out_dir', str(tmp_path / 'o2'),
                       '--max_images', '1'])
    assert np.isfinite(s2['avg_psnr'])
    assert 'avg_consistency_mae' not in s2
