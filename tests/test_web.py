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
    # JPEG save_outputs: color-recomposed PNG, no Z map (DCT-domain Z)
    sv = _post(jpeg_server, 'save_outputs', {'path': str(tmp_path / 'j')})
    assert sv['out'].endswith('_out.png') and 'z' not in sv
    from PIL import Image
    assert np.asarray(Image.open(sv['out'])).shape[-1] == 3


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


@pytest.mark.slow
def test_editing_tools_flow(server, tmp_path):
    """VERDICT round-2 gap: imprint / auto-location / HSV / digit /
    scribble reachable over HTTP — open -> auto-locate imprint -> place ->
    HSV edit -> digit -> scribble -> undo -> save Z
    (GUI.py:857-1283, 1552-1585, 1517-1547, 640-855)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    _post(server, 'open', {'image': _png_b64(img), 'is_hr': True})

    imprint = 0.9 * np.ones((16, 16, 3), np.float32)
    # auto-location: search inside a rect, position not committed yet
    loc = _post(server, 'find_imprint_location',
                {'image': _png_b64(imprint),
                 'search_rect': [8, 8, 88, 88], 'n_trials': 20})
    assert 'position' in loc and np.isfinite(loc['consistency_error'])
    y, x = loc['position']
    assert 8 <= y <= 80 and 8 <= x <= 80

    # place it (explicit position), with resizing
    out = _post(server, 'imprint',
                {'image': _png_b64(imprint), 'size': [24, 24],
                 'position': [y, x], 'optimize_iters': 4})
    assert out['position'] == [y, x]
    assert np.isfinite(out['final_loss'])

    # transparent-background imprint (special-behavior toggle,
    # GUI.py:880,1125-1131): white pixels keep the current output
    timp = np.ones((16, 16, 3), np.float32)
    timp[4:12, 4:12] = [0.1, 0.6, 0.1]
    out = _post(server, 'imprint',
                {'image': _png_b64(timp), 'position': [y, x],
                 'transparent': True, 'optimize_iters': 3})
    assert np.isfinite(out['final_loss'])

    # and the auto path end-to-end
    out = _post(server, 'imprint',
                {'image': _png_b64(imprint), 'auto': True,
                 'search_rect': [8, 8, 88, 88], 'n_trials': 10,
                 'optimize_iters': 2})
    assert np.isfinite(out['final_loss'])

    # HSV edit inside a region
    _post(server, 'region', {'rect': [16, 16, 80, 80]})
    out = _post(server, 'hsv', {'hue_shift': 40.0, 'sat': 1.3,
                                'val': 0.9, 'optimize_iters': 4})
    assert np.isfinite(out['final_loss'])

    # digit exploration (random classifier weights — just the wiring)
    out = _post(server, 'digit', {'digit': 3, 'max_iters': 2})
    assert np.isfinite(out['final_loss'])

    # scribble: authored 3-state mask + desired image over HTTP
    from PIL import Image
    sr = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _post(server, 'view', {'which': 'sr'})['png'])))) / 255.0
    desired = sr.copy()
    desired[30:40, 30:50] = [1.0, 0.1, 0.1]      # color stroke
    smask = np.zeros((96, 96), np.uint8)
    smask[30:40, 30:50] = 1                      # class 1 = color
    smask[50:60, 30:50] = 2                      # class 2 = brighten
    smask[70:78, 30:50] = 5                      # TV region id
    # the wire format scales ids by 16 (AA-proof buckets, web.py client)
    mask_rgb = np.repeat(smask[..., None], 3, -1) * 16 / 255.0
    out = _post(server, 'optimize', {
        'objective': 'scribble', 'max_iters': 4,
        'data': {'desired': _png_b64(desired),
                 'scribble_mask': _png_b64(mask_rgb),
                 'brightness_factor': 0.3}})
    assert np.isfinite(out['final_loss'])

    # history survived the whole tool chain
    st = _post(server, 'state', {})
    assert st['can_undo']
    _post(server, 'undo', {})
    zpath = str(tmp_path / 'z_tools.npz')
    assert _post(server, 'save_z', {'path': zpath})['ok']


@pytest.mark.slow
def test_jpeg_imprint_and_tool_errors(jpeg_server):
    """JPEG mode: Y-channel imprint works; SR-only tools answer with a
    clear error instead of crashing."""
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    _post(jpeg_server, 'open', {'image': _png_b64(img), 'qf': 10,
                                'recompress': True})
    imprint = 0.8 * np.ones((16, 16, 3), np.float32)
    out = _post(jpeg_server, 'imprint',
                {'image': _png_b64(imprint), 'position': [8, 8],
                 'size': [16, 16], 'optimize_iters': 3})
    assert out['position'] == [8, 8]
    assert np.isfinite(out['final_loss'])
    # HSV: value channel realizable on the Y-only latent; hue/sat edits
    # get an explanatory note (Manipulate_HSV is JPEG-wired in the
    # reference, GUI.py:475-480,1552-1585)
    h = _post(jpeg_server, 'hsv', {'val': 0.8, 'optimize_iters': 2})
    assert np.isfinite(h['final_loss']) and 'note' not in h
    h2 = _post(jpeg_server, 'hsv', {'hue_shift': 30.0,
                                    'optimize_iters': 1})
    assert 'note' in h2
    assert 'error' in _post(jpeg_server, 'find_imprint_location',
                            {'image': _png_b64(imprint)})
    # digit is a JPEG-mode tool in the reference (SVHN classifier loaded
    # only when JPEG_GUI, GUI.py:1332): optimize the region toward a digit
    _post(jpeg_server, 'region', {'rect': [8, 8, 40, 40]})
    d = _post(jpeg_server, 'digit', {'digit': 3, 'max_iters': 2})
    assert np.isfinite(d['final_loss'])
    # Auto_Explore_Digits (GUI.py:1517-1539): per-digit probe, session
    # left on the most likely single-digit decoding (if any survives the
    # length==1 filter — random classifier weights may reject all)
    a = _post(jpeg_server, 'digit', {'auto': True, 'max_iters': 1})
    assert 'most_likely' in a and 'per_digit_prob' in a
    if a['most_likely'] is not None:
        assert 0 <= a['most_likely'] <= 9 and 0.0 <= a['prob'] <= 1.0

    # scribble also drives the JPEG GUI in the reference (the
    # block-smeared selection mask exists for it, GUI.py:475-480):
    # authored color/darken strokes + a TV region inside the Y region
    from PIL import Image
    view = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _post(jpeg_server, 'view', {'which': 'out'})['png'])))) / 255.0
    if view.ndim == 2:
        view = np.repeat(view[..., None], 3, -1)
    desired = view[..., :3].copy()
    desired[10:18, 10:30] = [1.0, 1.0, 1.0]      # white stroke
    smask = np.zeros(view.shape[:2], np.uint8)
    smask[10:18, 10:30] = 1                      # class 1 = color
    smask[20:26, 10:30] = 3                      # class 3 = darken
    smask[28:36, 10:30] = 5                      # TV region id
    mask_rgb = np.repeat(smask[..., None], 3, -1) * 16 / 255.0
    out = _post(jpeg_server, 'optimize', {
        'objective': 'scribble', 'max_iters': 3,
        'data': {'desired': _png_b64(desired),
                 'scribble_mask': _png_b64(mask_rgb),
                 'brightness_factor': 0.3}})
    assert np.isfinite(out['final_loss'])

    # random alternatives are JPEG-reachable in the reference too
    # (ProcessRandZ runs through the task-agnostic Z_optimizer,
    # GUI.py:1476,1833): retain, browse, adopt, push
    o = _post(jpeg_server, 'optimize', {'objective': 'random_l1',
                                        'n_alternatives': 3,
                                        'max_iters': 2})
    assert o['n_alternatives'] == 2
    assert 'png' in _post(jpeg_server, 'alternative', {'index': 1})
    assert _post(jpeg_server, 'alternative',
                 {'index': 1, 'copy': True})['ok']
    assert _post(jpeg_server, 'alternative', {'push': True})['ok']
    assert 'error' in _post(jpeg_server, 'alternative', {'index': 7})


def test_alternatives_and_invert_region(server):
    """Random-alternative retention + CopyAlternative2Default + region
    inversion (GUI.py:1420,1424,1740-1800)."""
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    _post(server, 'open', {'image': _png_b64(img), 'is_hr': True})
    r = _post(server, 'region', {'rect': [16, 16, 80, 80]})
    assert r['selected_px'] == 64 * 64
    inv = _post(server, 'invert_region', {})
    assert inv['selected_px'] == 96 * 96 - 64 * 64
    _post(server, 'invert_region', {})   # back to the original selection

    out = _post(server, 'optimize', {'objective': 'random_l1',
                                     'n_alternatives': 3, 'max_iters': 4})
    assert out['n_alternatives'] == 2
    from PIL import Image
    before = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _post(server, 'view', {'which': 'sr'})['png'])))).astype(float)
    alt = _post(server, 'alternative', {'index': 1})
    assert 'png' in alt
    assert _post(server, 'alternative', {'index': 1, 'copy': True})['ok']
    after = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _post(server, 'view', {'which': 'sr'})['png'])))).astype(float)
    # the adopted alternative changes the output inside the region
    # (outside, Z is unchanged; the output may still move within the
    # generator's receptive field of the boundary)
    assert np.abs(after[16:80, 16:80] - before[16:80, 16:80]).max() > 0
    # CopyDefault2Alternative: push cur_Z back into the alternatives
    assert _post(server, 'alternative', {'push': True})['ok']
    assert 'png' in _post(server, 'alternative', {'index': 0})
    # out-of-range index reports instead of crashing
    assert 'error' in _post(server, 'alternative', {'index': 9})
    # inverting the full default selection leaves nothing selected —
    # the next edit must report a clear error, not crash in _crop_box
    _post(server, 'clear_region', {})
    assert _post(server, 'invert_region', {})['selected_px'] == 0
    assert 'error' in _post(server, 'optimize',
                            {'objective': 'max_STD', 'max_iters': 2})
    _post(server, 'invert_region', {})
    # reopening an image drops the retained alternatives of the old one
    _post(server, 'open', {'image': _png_b64(img), 'is_hr': True})
    assert 'error' in _post(server, 'alternative', {'index': 0})


def test_save_outputs_and_region_from_z(server, tmp_path):
    """save_file_and_Z_map + Load_Z_mask round-trip (GUI.py:1411,1425):
    the saved Z-map PNG encodes edited pixels away from neutral 127, and
    region_from_z recovers the editing mask from it."""
    rng = np.random.default_rng(11)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    _post(server, 'open', {'image': _png_b64(img), 'is_hr': True})
    # edit a sub-region so its Z leaves neutral
    _post(server, 'region', {'rect': [32, 32, 64, 64]})
    _post(server, 'uniform_z', {'values': [0.9, 0.9, 0.9]})
    out = _post(server, 'save_outputs',
                {'path': str(tmp_path / 'sess')})
    assert out['out'].endswith('_out.png') and out['z'].endswith('_Z.png')
    from PIL import Image
    assert np.asarray(Image.open(out['out'])).shape == (96, 96, 3)
    # wipe the selection, then recover it from the saved Z map
    _post(server, 'clear_region', {})
    r = _post(server, 'region_from_z', {'path': out['z']})
    assert 32 * 32 <= r['selected_px'] <= 34 * 34
    # shape-mismatch reports instead of crashing
    bad = np.full((8, 8, 3), 0.2, np.float32)
    assert 'error' in _post(server, 'region_from_z',
                            {'image': _png_b64(bad)})


def test_page_script_consistency():
    """No JS runtime in CI: statically check the page — every
    getElementById target exists in the markup, brackets balance in the
    script, and every api('name') call has a server-side endpoint."""
    import re
    from exsr.apps.web import PAGE, SessionApi
    body, script = PAGE.split('<script>')
    script = script.split('</script>')[0]
    ids_used = set(re.findall(r"getElementById\('([^']+)'\)", script))
    ids_defined = set(re.findall(r'id="([^"]+)"', body))
    missing = ids_used - ids_defined
    assert not missing, f'script references undefined ids: {missing}'
    for o, c in ('()', '{}', '[]'):
        assert script.count(o) == script.count(c), f'unbalanced {o}{c}'
    endpoints = set(re.findall(r"api\('([^']+)'", script))
    for ep in endpoints:
        assert callable(getattr(SessionApi, ep, None)), \
            f'page calls missing endpoint {ep}'


def test_scribble_mask_decode_formats():
    """_decode_scribble_mask: 16-wide bucket wire format with AA fringe
    gating, plus the legacy raw-id format (values <= 8) still accepted."""
    import base64
    import io
    from PIL import Image
    from exsr.apps.web import _decode_scribble_mask

    def b64_rgba(arr):
        buf = io.BytesIO()
        Image.fromarray(arr, 'RGBA').save(buf, format='PNG')
        return 'data:image/png;base64,' + base64.b64encode(
            buf.getvalue()).decode()

    a = np.zeros((4, 6, 4), np.uint8)
    a[0, 0] = [2 * 16, 2 * 16, 2 * 16, 255]     # class 2
    a[1, 1] = [15 * 16, 15 * 16, 15 * 16, 255]  # TV id 15 (max)
    a[2, 2] = [2 * 16 + 3, 2 * 16 + 3, 2 * 16 + 3, 255]  # AA noise -> 2
    a[3, 3] = [2 * 16, 2 * 16, 2 * 16, 40]      # low alpha -> background
    ids = _decode_scribble_mask(b64_rgba(a))
    assert ids[0, 0] == 2 and ids[1, 1] == 15 and ids[2, 2] == 2
    assert ids[3, 3] == 0 and ids[0, 5] == 0

    legacy = np.zeros((3, 3, 4), np.uint8)
    legacy[0, 0] = [1, 1, 1, 255]
    legacy[1, 1] = [5, 5, 5, 255]   # TV region id, raw
    ids = _decode_scribble_mask(b64_rgba(legacy))
    assert ids[0, 0] == 1 and ids[1, 1] == 5


def test_esrgan_comparison_view():
    """The GUI's display_ESRGAN slot (GUI.py:2539-2550): a plain Z-less,
    CEM-less ESRGAN run on the LR image, served as view 'esrgan'."""
    session = EditSession(scale=4, nb=1, time_budget_s=3.0)
    session.init_random_params(0)
    api = SessionApi(session)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    api.open({'image': _png_b64(img), 'is_hr': True})
    # not attached: helpful error, not a crash
    r = api.view({'which': 'esrgan'})
    assert 'error' in r and 'esrgan' in r['error'].lower()
    session.attach_esrgan(nb=1)
    r = api.view({'which': 'esrgan'})
    assert 'png' in r
    e1 = session.esrgan_sr()
    assert e1.shape == session.sr.shape
    # unconstrained ESRGAN differs from the CEM-wrapped explorable output
    assert np.abs(e1 - session.sr).max() > 1e-4
    # cached per working image; recomputed after a new open
    assert session.esrgan_sr() is e1
    api.open({'image': _png_b64(img[:48, :48]), 'is_hr': True})
    e2 = session.esrgan_sr()
    assert e2 is not e1 and e2.shape == session.sr.shape


def test_main_accepts_gui_opt_configs(tmp_path):
    """`web --opt GUI_SR.json` / `GUI_JPEG.json` — the reference's
    `GUI.py SR -opt ...` launch path: the config decides mode and
    generator architecture (GUI.py:1320-1329)."""
    import json as _json
    import os
    from exsr.apps.web import main
    gui_sr = {
        'name': 'g', 'model': 'srragan', 'scale': 4,
        'path': {'root': str(tmp_path)},
        'network_G': {'which_model_G': 'RRDB_net', 'CEM_arch': 1,
                      'latent_input': 'all_layers', 'latent_channels': 3,
                      'nf': 64, 'nb': 1, 'in_nc': 3, 'out_nc': 3,
                      'gc': 32},
    }
    p1 = tmp_path / 'gui_sr.json'
    p1.write_text(_json.dumps(gui_sr))
    srv = main(['--opt', str(p1), '--port', '0'], serve=False)
    try:
        api = srv.api
        assert api.session.nb == 1            # from the config
        assert api.session.latent_channels == 3
    finally:
        srv.server_close()
    gui_jpeg = {
        'name': 'gj', 'model': 'dncnn', 'scale': 4,
        'path': {'root': str(tmp_path)},
        'network_G': {'which_model_G': 'DnCNN', 'DCT_G': 1,
                      'latent_input': 'all_layers',
                      'latent_channels': 64, 'nf': 16, 'nb': 2,
                      'in_nc': 64, 'out_nc': 64},
    }
    p2 = tmp_path / 'gui_jpeg.json'
    p2.write_text(_json.dumps(gui_jpeg))
    srv2 = main(['--opt', str(p2), '--port', '0'], serve=False)
    try:
        api2 = srv2.api
        from exsr.apps.web import JpegSessionApi
        assert isinstance(api2, JpegSessionApi)  # model 'dncnn' -> jpeg
        assert api2.session.nf == 16 and api2.session.nb == 2
    finally:
        srv2.server_close()
    # the real reference GUI configs parse through the same path
    ref = '/root/reference/codes/options/test/GUI_SR.json'
    if os.path.exists(ref):
        srv3 = main(['--opt', ref, '--nb', '1', '--port', '0'],
                    serve=False)
        try:
            assert srv3.api.session.nb == 1   # explicit flag wins
        finally:
            srv3.server_close()
    refj = '/root/reference/codes/options/test/GUI_JPEG.json'
    if os.path.exists(refj):
        # network_G is the CHROMA net (nf=160); the served Y generator
        # takes network_G_Y's override (nf=320) — DecompCNN_model.py:64-67
        srv4 = main(['--opt', refj, '--port', '0'], serve=False)
        try:
            assert isinstance(srv4.api, JpegSessionApi)
            assert srv4.api.session.nf == 320
            assert srv4.api.session.latent_channels == 64
        finally:
            srv4.server_close()
