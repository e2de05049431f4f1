"""Pretrained-weight conversion: torch ESRGAN/reference checkpoints -> exsr.

The reference warm-starts the explorable generator from a Z-less ESRGAN
checkpoint by zero-initializing the extra latent input channels
(process_loaded_state_dict, base_model.py:146-190).  This module converts a
torch RRDB state dict (either the original ESRGAN layout `model.0.weight`,
`model.1.sub.N...` or the reference's ModuleList layout) into our flax
RRDBNet params with the same zero-init Z migration.

Torch OIHW conv weights become HWIO; the reference's channel order for a
Z-injected conv is [z, x] (torch cat([latent, x], 1)) which matches our
ZConv concatenation order, so Z columns are PREPENDED zero blocks.
"""
from __future__ import annotations

import re

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _prepend_zero_in_channels(kernel_hwio: np.ndarray, nz: int
                              ) -> np.ndarray:
    """Zero-init latent input channels in front of the image channels
    (base_model.py:146-190 zero-pads the new Z input channels)."""
    if nz == 0:
        return kernel_hwio
    kh, kw, cin, cout = kernel_hwio.shape
    z = np.zeros((kh, kw, nz, cout), kernel_hwio.dtype)
    return np.concatenate([z, kernel_hwio], axis=2)


def convert_esrgan_rrdb(state: dict, nb: int = 23,
                        latent_channels: int = 3) -> dict:
    """torch ESRGAN RRDB state dict -> exsr RRDBNet params pytree.

    Accepts the classic ESRGAN layout:
      model.0.*                      fea_conv
      model.1.sub.{i}.RDB{r}.conv{c}.0.*   trunk blocks (i in 0..nb-1)
      model.1.sub.{nb}.*             trunk_conv
      model.3.* / model.6.*          upconv0 / upconv1
      model.8.* / model.10.*         hr_conv0 / hr_conv1
    """
    def get(k):
        v = state[k]
        return v.numpy() if hasattr(v, 'numpy') else np.asarray(v)

    nz = latent_channels
    params: dict = {}

    # channel widths read off the checkpoint itself, so the exact no-z
    # input width of every conv is known (nf = fea_conv outs, gc = RDB
    # inner-conv outs); the z decision is then an equality check rather
    # than a modulo heuristic (which misfired when nz was a multiple of
    # the compared modulus, e.g. nz=32 -> 64+32 = 96 ≡ 0 mod 32)
    nf = int(get('model.0.weight').shape[0])
    gc = int(get('model.1.sub.0.RDB1.conv1.0.weight').shape[0])

    def conv_entry(wkey, bkey, nz_pad, expect_in):
        """Two accepted provenances (base_model.process_loaded_state_dict
        semantics, base_model.py:146-190): a plain ESRGAN checkpoint
        (no Z input channels -> zero-init them, the reference's
        warm-start path) or a TRAINED explorable checkpoint whose convs
        already include the nz latent input channels (keep as-is).
        `expect_in` is the exact no-z input width for this conv."""
        kernel = _oihw_to_hwio(get(wkey))
        if nz_pad > 0:
            base_in = kernel.shape[2]
            if base_in == expect_in:
                kernel = _prepend_zero_in_channels(kernel, nz_pad)
            elif base_in != expect_in + nz_pad:
                raise ValueError(
                    f'{wkey}: input width {base_in} matches neither the '
                    f'no-z width {expect_in} nor the explorable width '
                    f'{expect_in + nz_pad} (nz={nz_pad})')
        entry = {'kernel': kernel}
        if bkey in state:
            entry['bias'] = get(bkey)
        return entry

    params['fea_conv'] = conv_entry('model.0.weight', 'model.0.bias', nz, 3)

    # trunk: stacked params [nb, ...] for the scan body
    def stack(fn):
        items = [fn(i) for i in range(nb)]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    trunk: dict = {}
    for r in (1, 2, 3):
        rdb: dict = {}
        for c in range(5):
            def one(i, r=r, c=c):
                base = f'model.1.sub.{i}.RDB{r}.conv{c + 1}.0'
                return conv_entry(f'{base}.weight', f'{base}.bias', nz,
                                  nf + gc * c)
            rdb[f'conv{c}'] = {'Conv_0': stack(one)}
        trunk[f'rdb{r}'] = rdb
    params['trunk'] = {'RRDB_0': trunk}  # scan body module name
    params['trunk_conv'] = {'Conv_0': conv_entry(
        f'model.1.sub.{nb}.weight', f'model.1.sub.{nb}.bias', nz, nf)}
    params['upconv0'] = conv_entry('model.3.weight', 'model.3.bias', 0, nf)
    params['upconv1'] = conv_entry('model.6.weight', 'model.6.bias', 0, nf)
    params['hr_conv0'] = {'Conv_0': conv_entry(
        'model.8.weight', 'model.8.bias', nz, nf)}
    params['hr_conv1'] = {'Conv_0': conv_entry(
        'model.10.weight', 'model.10.bias', nz, nf)}
    return {'params': params}


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pth state dict (CPU), unwrapping DataParallel and CEM
    wrappers (Adjust_State_Dict_Keys semantics, CEMnet.py:403-412)."""
    import torch
    raw = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(raw, dict) and 'state_dict' in raw:
        raw = raw['state_dict']
    out = {}
    for k, v in raw.items():
        k = re.sub(r'^module\.', '', k)
        k = re.sub(r'^generated_image_model\.', '', k)
        if 'Filter_OP' in k:   # CEM frozen filters — rebuilt analytically
            continue
        out[k] = v
    return out


def align_params_to(template, converted):
    """Cast/verify a converted pytree against a model-init template; raises
    on shape mismatches with a readable path."""
    import jax

    def check(path, a, b):
        if tuple(np.shape(a)) != tuple(np.shape(b)):
            raise ValueError(
                f'shape mismatch at {jax.tree_util.keystr(path)}: '
                f'template {np.shape(a)} vs converted {np.shape(b)}')
        return np.asarray(b, dtype=np.asarray(a).dtype)

    return jax.tree_util.tree_map_with_path(check, template, converted)


def _conv_hwio_entry(state: dict, key: str) -> dict:
    w = np.asarray(state[f'{key}.weight'])
    return {'kernel': _oihw_to_hwio(w),
            'bias': np.asarray(state[f'{key}.bias'])}


def convert_msrresnet(state: dict, nf: int = 64, nb: int = 16,
                      upscale: int = 4) -> dict:
    """Torch MSRResNet state dict -> flax MSRResNet params
    (architecture.py:18-66; keys conv_first / recon_trunk.<i>.conv1|2 /
    upconv<k> / HRconv / conv_last).

    Torch ``PixelShuffle`` expects output channels grouped as (C, r, r)
    while the flax pixel shuffle in classifiers.MSRResNet decomposes them
    as (r, r, C), so each upconv's output channels (kernel + bias) are
    permuted accordingly.
    """
    state = {k.replace('module.', ''): v for k, v in state.items()}
    p = {'conv_first': _conv_hwio_entry(state, 'conv_first')}
    for i in range(nb):
        p[f'rb{i}_conv1'] = _conv_hwio_entry(state,
                                             f'recon_trunk.{i}.conv1')
        p[f'rb{i}_conv2'] = _conv_hwio_entry(state,
                                             f'recon_trunk.{i}.conv2')
    n_up = 1 if upscale == 3 else int(np.log2(upscale))
    f = 3 if upscale == 3 else 2
    for u in range(n_up):
        w = np.asarray(state[f'upconv{u + 1}.weight'])
        b = np.asarray(state[f'upconv{u + 1}.bias'])
        o = w.shape[0]
        c = o // (f * f)
        # flax slot a*f*C + b*C + ch holds torch channel ch*f*f + a*f + b
        idx = np.arange(o).reshape(c, f, f).transpose(1, 2, 0).reshape(-1)
        p[f'upconv{u + 1}'] = {'kernel': _oihw_to_hwio(w[idx]),
                               'bias': b[idx]}
    p['HRconv'] = _conv_hwio_entry(state, 'HRconv')
    p['conv_last'] = _conv_hwio_entry(state, 'conv_last')
    return {'params': p}
