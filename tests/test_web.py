"""End-to-end drive of the thin web frontend (exsr/apps/web.py) over HTTP:
open image -> select region -> optimize -> undo -> save/load Z -> kernel
switch — the scripted equivalent of the reference GUI flow
(GUI.py:1316-2686)."""
import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from exsr.apps.session import EditSession
from exsr.apps.web import SessionApi, make_server


@pytest.fixture(scope='module')
def server():
    session = EditSession(scale=4, nb=1, time_budget_s=3.0)
    session.init_random_params(0)
    api = SessionApi(session)
    srv = make_server(api, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def _post(base, name, body):
    req = urllib.request.Request(
        f'{base}/api/{name}', data=json.dumps(body).encode(),
        headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def _png_b64(img01):
    from PIL import Image
    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode()


def test_page_served(server):
    with urllib.request.urlopen(server + '/', timeout=30) as r:
        page = r.read().decode()
    assert 'explorable' in page and 'api/' in page


@pytest.mark.slow
def test_full_edit_flow(server, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    out = _post(server, 'open', {'image': _png_b64(img), 'is_hr': True})
    assert out['sr_shape'] == [1, 96, 96, 3]
    assert out['lr_shape'] == [1, 24, 24, 3]

    view = _post(server, 'view', {'which': 'sr'})
    from PIL import Image
    sr0 = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(view['png']))))
    assert sr0.shape == (96, 96, 3)

    out = _post(server, 'region', {'rect': [16, 16, 80, 80]})
    assert out['selected_px'] == 64 * 64

    out = _post(server, 'uniform_z', {'values': [0.7, -0.4, 0.2]})
    assert out['ok']
    sr1 = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _post(server, 'view', {'which': 'sr'})['png']))))
    assert np.abs(sr1.astype(int) - sr0.astype(int)).max() > 0

    out = _post(server, 'optimize', {'objective': 'max_STD',
                                     'max_iters': 5,
                                     'time_budget_s': 30.0})
    assert np.isfinite(out['final_loss'])

    state = _post(server, 'state', {})
    assert state['can_undo']
    _post(server, 'undo', {})
    _post(server, 'undo', {})
    sr_undone = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _post(server, 'view', {'which': 'sr'})['png']))))
    np.testing.assert_array_equal(sr_undone, sr0)

    zpath = str(tmp_path / 'z.npz')
    assert _post(server, 'save_z', {'path': zpath})['ok']
    assert _post(server, 'load_z', {'path': zpath})['ok']

    out = _post(server, 'kernel', {'kind': 'blurry_cubic_1.0'})
    assert out['ok'] and out['margins_lr'] > 0
    out = _post(server, 'kernel', {'kind': 'bicubic'})
    assert out['ok']

    out = _post(server, 'region', {'polygon': [[10, 10], [10, 60],
                                               [60, 35]]})
    assert 0 < out['selected_px'] < 96 * 96

    # unknown endpoint reports, not crashes
    out = _post(server, 'nope', {})
    assert 'error' in out


@pytest.fixture(scope='module')
def jpeg_server():
    from exsr.apps.jpeg_session import JPEGEditSession
    from exsr.apps.web import JpegSessionApi
    session = JPEGEditSession(nf=16, nb=3, latent_channels=64, qf=10)
    session.init_random_params(0)
    api = JpegSessionApi(session)
    srv = make_server(api, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def test_jpeg_web_flow(jpeg_server, tmp_path):
    """JPEG-mode thin client: open at QF -> region -> uniform z -> optimize
    -> undo -> z save/load (GUI's JPEG tool vocabulary over HTTP)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    out = _post(jpeg_server, 'open', {'image': _png_b64(img), 'qf': 10})
    assert out['out_shape'] == [1, 64, 64, 1]
    assert out['qf'] == 10.0

    st = _post(jpeg_server, 'state', {})
    assert st['has_image'] and st['mode'] == 'jpeg'

    view = _post(jpeg_server, 'view', {'which': 'out'})
    assert 'png' in view
    assert 'png' in _post(jpeg_server, 'view', {'which': 'input'})

    r = _post(jpeg_server, 'region', {'rect': [16, 16, 48, 48]})
    assert r['selected_px'] == 32 * 32  # already block-aligned

    u = _post(jpeg_server, 'uniform_z', {'values': [0.9, -0.4, 0.2]})
    assert u['ok']

    o = _post(jpeg_server, 'optimize', {'objective': 'max_STD',
                                        'max_iters': 4})
    assert o['final_loss'] is not None

    assert _post(jpeg_server, 'undo', {})['ok']
    zpath = str(tmp_path / 'z.npz')
    assert _post(jpeg_server, 'save_z', {'path': zpath})['ok']
    assert _post(jpeg_server, 'load_z', {'path': zpath})['ok']
    assert _post(jpeg_server, 'svd', {'lambda0': 1})['error']


def test_jpeg_web_opens_real_jpeg_coefficients(jpeg_server):
    """Uploading an actual JPEG edits its own quantized coefficients
    (exact DQT) rather than recompressing (GUI.py:2425-2481 path)."""
    rng = np.random.default_rng(1)
    arr = (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)
    buf = io.BytesIO()
    from PIL import Image
    Image.fromarray(arr).save(buf, format='JPEG', quality=20)
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = _post(jpeg_server, 'open', {'image': b64})
    assert out['source'] == 'jpeg-coefficients'
    assert 10 <= out['qf'] <= 35
    out2 = _post(jpeg_server, 'open', {'image': b64, 'recompress': True})
    assert out2['source'] == 'recompressed'
