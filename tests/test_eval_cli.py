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


def test_eval_jpeg_cli(img_dir, tmp_path):
    from exsr.apps import eval_jpeg
    out = str(tmp_path / 'outj')
    eval_jpeg.main(['--data_dir', img_dir, '--qf', '10', '--nf', '16',
                    '--nb', '3', '--out_dir', out])
    summary = json.load(open(os.path.join(out, 'summary.json')))['summary']
    assert np.isfinite(summary['avg_psnr_jpeg'])
    assert np.isfinite(summary['avg_psnr_decomp'])


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
        'network_G': {'which_model_G': 'RRDB_net', 'nf': 64, 'nb': 1,
                      'in_nc': 3, 'out_nc': 3, 'gc': 32},
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
