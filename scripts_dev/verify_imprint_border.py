"""Verify drive: imprint at a border position (SR session on the real
TPU + JPEG web API) — the round-3 crop-to-canvas fix exercised end to end."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def main():
    img = np.asarray(Image.open(
        '/root/reference/Samples/face_GT_HR.png'))[:276, :276, :3] / 255.0

    from exsr.apps.session import EditSession
    s = EditSession(nb=23, time_budget_s=20.0)
    s.init_random_params(0)
    s.open_image(img.astype(np.float32), is_hr=True)
    h, w = s.sr.shape[1:3]
    imprint = 0.85 * np.ones((24, 24, 3), np.float64)
    res = s.imprint(imprint, (h - 10, w - 10), optimize_iters=4)
    print('SR border imprint: final_loss', float(res['final_loss']),
          'rounds', res['rounds'])
    assert np.isfinite(res['final_loss'])
    # the CEM guarantee must survive the edit — measured on the UNCLIPPED
    # forward (the displayed SR is clipped to [0,1]; clipping legitimately
    # breaks raw consistency wherever the random-weights model leaves the
    # range, exactly like the reference GUI's display path)
    import jax.numpy as jnp
    from exsr.cem.cem import consistent_downsample
    raw = s._wrapped(s.eff_params, jnp.asarray(s.lr_image),
                     jnp.asarray(s.cur_z), s.cem.invalidity_margins_lr,
                     pre_pad=True)
    down = np.asarray(consistent_downsample(
        jnp.asarray(raw, jnp.float32), s.filters,
        s.cem.ds_kernel_invalidity_half_size_lr))
    m = int(s.cem.invalidity_margins_lr)
    err = float(np.abs(down - s.lr_image)[:, m:-m, m:-m].max())
    print('consistency max err inside margins (unclipped):', err)
    assert err < 5e-5, err

    # JPEG web API: border imprint returns a result (not a shape error)
    from exsr.apps.jpeg_session import JPEGEditSession
    from exsr.apps.web import JpegSessionApi, _png_bytes
    import base64
    js = JPEGEditSession(nf=64, nb=4)
    js.init_random_params(0)
    api = JpegSessionApi(js)
    png64 = 'data:image/png;base64,' + base64.b64encode(
        _png_bytes(img[:128, :128])).decode()
    out = api.dispatch('open', {'image': png64, 'qf': 10,
                                'recompress': True})
    assert 'out_shape' in out, out
    imp64 = 'data:image/png;base64,' + base64.b64encode(
        _png_bytes(0.9 * np.ones((32, 32, 3)))).decode()
    r = api.dispatch('imprint', {'image': imp64, 'position': [112, 112],
                                 'optimize_iters': 3})
    print('JPEG web border imprint:', r)
    assert 'error' not in r, r
    r2 = api.dispatch('imprint', {'image': imp64, 'position': [500, 500],
                                  'optimize_iters': 1})
    assert 'error' in r2 and 'outside' in r2['error'], r2
    print('fully-outside position correctly rejected:', r2['error'])
    print('VERIFY OK')


if __name__ == '__main__':
    main()
