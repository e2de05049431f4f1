"""Headless explorable-JPEG edit session — the GUI's JPEG task backend.

The JPEG twin of :class:`exsr.apps.session.EditSession` (GUI.py with task
'JPEG': quality-factor control, real-JPEG coefficient input, Z edits over
the 64-channel DCT latent via the 3-channel GUI controls, consistency by
quantization-bin clamping).  Reference: GUI.py:1320-1323,2328-2352,
2425-2481; DecompCNN_model.py:293-334.
"""
from __future__ import annotations

import dataclasses
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from exsr.jpeg.codec import JPEGCodec, consistency_clamp
from exsr.models.dncnn import DnCNN, DnCNNConfig
from exsr.train.decomp import repeat_z_3_channels, z_to_3_channels
from exsr.utils.color import rgb2ycbcr
from exsr.zopt.optimizer import ZOptimizer, atanh_init
from exsr.zopt import objectives as obj


@dataclasses.dataclass
class JPEGEditSession:
    nf: int = 320
    nb: int = 10
    latent_channels: int = 64
    qf: int = 10
    time_budget_s: float = 30.0

    def __post_init__(self):
        self.codec = JPEGCodec()
        self.generator = DnCNN(DnCNNConfig(
            n_channels=self.nf, depth=self.nb,
            num_latent_channels=self.latent_channels))
        self.params = None
        self.y_image = None     # [1, H, W, 1] in [0, 255]
        self.comp = None        # quantized coefficients
        self.cur_z = None       # [1, hb, wb, 64]
        self.region_mask = None  # [H, W]
        self.out = None
        self._history: deque = deque(maxlen=100)
        self._redo: deque = deque(maxlen=100)

    def init_random_params(self, seed: int = 0):
        c0 = jnp.zeros((1, 8, 8, 64))
        z0 = jnp.zeros((1, 8, 8, self.latent_channels))
        self.params = dict(self.generator.init(jax.random.PRNGKey(seed),
                                               c0, z0))

    def load_params(self, params):
        self.params = dict(params)

    def _g_apply(self, params, coeffs, z):
        if 'batch_stats' in params:
            out, _ = self.generator.apply(params, coeffs, z, train=False,
                                          mutable=['batch_stats'])
            return out
        return self.generator.apply(params, coeffs, z, train=False)

    def attach_chroma(self, gc_params, nf: int = 320, nb: int = 10):
        """Attach a trained explorable-chroma generator: CbCr is then
        reconstructed by the chroma model conditioned on the EDITED Y
        (USE_Y_GENERATOR_4_CHROMA semantics, DecompCNN_model.py:23,
        711-729) instead of the input chroma planes."""
        from exsr.jpeg.codec import JPEGCodec
        # low-freq-only chroma head (out 2x64, NO_HIGH_FREQ_CHROMA_
        # RECONSTRUCTION — DecompCNN_model.py:24), matching what
        # ChromaDecompTrainer trains so `train_jpeg --chroma` checkpoints
        # load directly
        self.chroma_generator = DnCNN(DnCNNConfig(
            n_channels=nf, depth=nb, in_nc=256 + 128,
            out_nc=2 * 64, chroma_generator=True, block_size=8,
            num_latent_channels=0))
        self.chroma_params = gc_params
        self.codec_chroma = JPEGCodec(chroma_mode=True, block_size=16)

    def decode_chroma(self) -> np.ndarray:
        """[H, W, 2] CbCr (0..255) from the attached chroma generator,
        conditioned on the current edited Y and the input chroma
        (ChromaDecompTrainer._decode path, exsr/train/decomp_chroma.py)."""
        assert getattr(self, 'chroma_params', None) is not None
        assert self.out is not None and self._cbcr_input is not None
        h16 = (self.out.shape[1] // 16) * 16
        w16 = (self.out.shape[2] // 16) * 16
        y_cond = self.out[:, :h16, :w16, 0] * 255.0
        cbcr = self._cbcr_input[None, :h16, :w16]
        img = jnp.concatenate([jnp.asarray(y_cond)[..., None],
                               jnp.asarray(cbcr)], axis=-1)
        packed = self.codec_chroma.compress_ycbcr(
            img, self._qf_arr(), downsample_or_quantize=True)
        z16 = jnp.zeros(packed.shape[:3] + (0,))
        coeffs = self.chroma_generator.apply(self.chroma_params, packed,
                                             z16, train=False)
        out = self.codec_chroma.extract_ycbcr(coeffs, self._qf_arr())
        full = np.full(self.out.shape[1:3] + (2,), 128.0, np.float32)
        full[:h16, :w16] = np.asarray(out[0])
        return full

    # -------------------------------------------------------------- loading
    def open_image(self, rgb_image: np.ndarray, qf: int | None = None):
        """Compress an RGB image at the session QF and decode it
        (GUI.py:2328-2352)."""
        if qf is not None:
            self.qf = qf
        ycbcr = rgb2ycbcr(rgb_image.astype(np.float32),
                          only_y=False) * 255.0
        y = ycbcr[..., 0]
        h, w = (y.shape[0] // 8) * 8, (y.shape[1] // 8) * 8
        self.file_q_table = None
        self.file_chroma = None
        # the input chroma planes condition the optional trained-chroma
        # decode (and are NOT shown directly unless no generator is set)
        self._cbcr_input = ycbcr[:h, :w, 1:].astype(np.float32)
        self._ycbcr_full_range = False  # MATLAB studio-swing convention
        self.y_image = jnp.asarray(y[:h, :w][None, ..., None])
        self.comp = self.codec.compress(self.y_image, self._qf_arr(),
                                        quantize=True)
        hb, wb = self.comp.shape[1:3]
        self.cur_z = np.zeros((1, hb, wb, self.latent_channels), np.float32)
        self.region_mask = np.ones((h, w), np.float32)
        self._history.clear()
        self._redo.clear()
        self._alternatives = None   # retained Zs belong to the old image
        return self.recompute()

    def open_jpeg_file(self, path: str):
        """Open a real baseline JPEG for editing: entropy-decode its
        quantized Y coefficients + Q table with the dependency-free JFIF
        parser (the reference's optional jpeg2dct path, GUI.py:2425-2481).
        """
        with open(path, 'rb') as f:
            return self.open_jpeg_bytes(f.read())

    def open_jpeg_bytes(self, data: bytes):
        """Byte-string variant of :meth:`open_jpeg_file` (uploads).

        Keeps the file's decoded chroma planes so edited output can be
        recombined to color for display (the reference GUI shows the
        edited Y composed with the input chroma, GUI.py:2443-2481)."""
        from exsr.jpeg.jfif import decode_jfif
        from exsr.ops.dct import dct_to_image
        dec = decode_jfif(data)
        y = dec['components'][0]
        out = self.open_coefficients(y.coeffs.astype(np.float32),
                                     y.q_table.astype(np.float64))
        if len(dec['components']) == 3:
            ymax_h = y.sampling[0]
            ymax_v = y.sampling[1]
            hpix, wpix = self.region_mask.shape
            chroma = []
            for comp in dec['components'][1:]:
                deq = comp.coeffs.astype(np.float64) * \
                    comp.q_table.reshape(-1)[None, None, :]
                px = np.asarray(dct_to_image(jnp.asarray(deq[None]),
                                             bs=8))[0, :, :, 0] + 128.0
                px = np.repeat(np.repeat(px, ymax_v // comp.sampling[1],
                                         0),
                               ymax_h // comp.sampling[0], 1)
                chroma.append(px[:hpix, :wpix])
            self.file_chroma = np.stack(chroma, -1)  # [H, W, 2] in 0..255
            # also usable as trained-chroma conditioning (JFIF Cb/Cr is
            # 128-centered like the training convention; scale differs
            # only by the 16-240 studio swing)
            self._cbcr_input = self.file_chroma.astype(np.float32)
            # real-file planes are JFIF FULL-range; compose_rgb must use
            # the full-range BT.601 inverse, not the MATLAB studio-swing
            self._ycbcr_full_range = True
        return out

    def compose_rgb(self) -> np.ndarray:
        """Current edited Y composed to color, [H, W, 3] in [0, 1].

        Priority: trained chroma generator (attach_chroma) conditioned on
        the edited Y -> the opened file's chroma planes (JFIF full-range
        BT.601) -> grayscale replicate."""
        y = self.out[0, :, :, 0] * 255.0
        if (getattr(self, 'chroma_params', None) is not None
                and getattr(self, '_cbcr_input', None) is not None):
            cbcr = self.decode_chroma()
            if getattr(self, '_ycbcr_full_range', False):
                # real-file session: Y and conditioning chroma are JFIF
                # full-range — studio-swing ycbcr2rgb would stretch
                # contrast ~255/219 and crush blacks
                return self._full_range_inverse(y, cbcr)
            from exsr.utils.color import ycbcr2rgb
            ycbcr = np.concatenate([y[..., None], cbcr], -1)
            # MATLAB-convention inverse (the training pipeline's rgb2ycbcr)
            return np.clip(ycbcr2rgb(ycbcr.astype(np.float32) / 255.0),
                           0.0, 1.0)
        ch = getattr(self, 'file_chroma', None)
        if ch is None:
            g = np.clip(y / 255.0, 0, 1)
            return np.stack([g, g, g], -1)
        return self._full_range_inverse(y, ch)

    @staticmethod
    def _full_range_inverse(y: np.ndarray, cbcr: np.ndarray) -> np.ndarray:
        """Full-range BT.601 YCbCr (0..255, 128-centered chroma) -> RGB
        [0, 1] (the JFIF convention, ITU T.871)."""
        cb = cbcr[:, :, 0] - 128.0
        cr = cbcr[:, :, 1] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.clip(np.stack([r, g, b], -1) / 255.0, 0.0, 1.0)

    def open_coefficients(self, coeffs: np.ndarray, q_table: np.ndarray):
        """Open a real JPEG's quantized DCT coefficients + its Q table
        (GUI.py:2425-2481; QF recovered per Set_Q_Table(QF=False),
        JPEG.py:83-86)."""
        from exsr.jpeg.codec import LUMA_Q_TABLE
        self.file_q_table = np.asarray(q_table, np.float32)
        self.file_chroma = None
        self._cbcr_input = None
        ratio = float(np.mean(LUMA_Q_TABLE / q_table))
        if ratio < 1:
            self.qf = 50 * ratio
        else:
            self.qf = 50 * float(np.mean(
                (2 * LUMA_Q_TABLE - q_table) / LUMA_Q_TABLE))
        self.comp = jnp.asarray(coeffs[None] if coeffs.ndim == 3
                                else coeffs)
        hb, wb = self.comp.shape[1:3]
        self.cur_z = np.zeros((1, hb, wb, self.latent_channels), np.float32)
        self.region_mask = np.ones((hb * 8, wb * 8), np.float32)
        self.y_image = None
        self._alternatives = None   # retained Zs belong to the old image
        return self.recompute()

    def _qf_arr(self):
        return jnp.asarray([float(self.qf)])

    def _q_arr(self):
        """Exact quantization table when editing a real file (its DQT),
        else None (codec falls back to the IJG QF-scaled table).  Using
        the true table makes decode/consistency exact where the
        reference's scalar-QF recovery (JPEG.py:83-86) is approximate."""
        if getattr(self, 'file_q_table', None) is None:
            return None
        return jnp.asarray(self.file_q_table.reshape(1, 1, 1, 64))

    def recompute(self):
        coeffs = self._g_apply(self.params, self.comp,
                               jnp.asarray(self.cur_z))
        coeffs = consistency_clamp(coeffs, self.comp)  # belt & suspenders
        self.out = np.asarray(jnp.clip(
            self.codec.extract(coeffs, self._qf_arr(),
                               q=self._q_arr()) / 255.0, 0, 1))
        return self.out

    # ---------------------------------------------------------------- state
    def _push(self):
        self._history.append(self.cur_z.copy())
        self._redo.clear()

    def undo(self):
        if self._history:
            self._redo.append(self.cur_z.copy())
            self.cur_z = self._history.pop()
            self.recompute()
        return self.out

    def redo(self):
        if self._redo:
            self._history.append(self.cur_z.copy())
            self.cur_z = self._redo.pop()
            self.recompute()
        return self.out

    # ----------------------------------------------- alternatives (random)
    def _alternative_z(self, i: int) -> np.ndarray:
        alt = getattr(self, '_alternatives', None)
        assert alt is not None and 0 <= i < len(alt['zs']), \
            'no retained alternatives — run optimize with n_alternatives>1'
        return alt['zs'][i:i + 1]

    def alternative_out(self, i: int) -> np.ndarray:
        """Decoded output of retained random alternative ``i``
        (random_Zs browsing, GUI.py:1740-1800)."""
        coeffs = self._g_apply(self.params, self.comp,
                               jnp.asarray(self._alternative_z(i)))
        coeffs = consistency_clamp(coeffs, self.comp)
        return np.asarray(jnp.clip(
            self.codec.extract(coeffs, self._qf_arr(),
                               q=self._q_arr()) / 255.0, 0, 1))

    def copy_alternative(self, i: int):
        """CopyAlternative2Default (GUI.py:1420): adopt alternative
        ``i``'s Z inside the selected region (8x8-block space)."""
        alt_z = self._alternative_z(i)
        self._push()
        bm = getattr(self, '_block_mask',
                     np.ones(self.cur_z.shape[1:3], np.float32))
        m = bm[None, :, :, None]
        self.cur_z = alt_z * m + self.cur_z * (1 - m)
        return self.recompute()

    def copy_default_to_alternatives(self):
        """CopyDefault2Alternative (GUI.py:1421,1817)."""
        alt = getattr(self, '_alternatives', None)
        assert alt is not None, \
            'no retained alternatives — run optimize with n_alternatives>1'
        bm = getattr(self, '_block_mask',
                     np.ones(self.cur_z.shape[1:3], np.float32))
        m = bm[None, :, :, None]
        alt['zs'] = alt['zs'] * (1 - m) + self.cur_z * m

    def set_region(self, mask: np.ndarray):
        """HR-pixel mask; JPEG edits smear masks to whole 8x8 blocks
        (utils/util.py SmearMask2JpegBlocks)."""
        h, w = mask.shape
        m = mask.reshape(h // 8, 8, w // 8, 8).max(axis=(1, 3))
        self.region_mask = np.repeat(np.repeat(m, 8, 0), 8, 1) \
            .astype(np.float32)
        self._block_mask = m.astype(np.float32)

    def set_uniform_z3(self, values3):
        """3-channel GUI control -> tiled 64-channel Z
        (DecompCNN_model.py:293-314)."""
        self._push()
        z3 = np.asarray(values3, np.float32).reshape(1, 1, 1, 3)
        z64 = np.asarray(repeat_z_3_channels(jnp.asarray(z3),
                                             self.latent_channels))
        bm = getattr(self, '_block_mask',
                     np.ones(self.cur_z.shape[1:3], np.float32))
        m = bm[None, :, :, None]
        self.cur_z = (1 - m) * self.cur_z + m * z64
        return self.recompute()

    def find_optimal_imprint_mask(self, desired_image_y: np.ndarray,
                                  desired_mask: np.ndarray, rect,
                                  top_left, target_dims):
        """JPEG imprint border fine-tuning
        (GUI.Find_Optimal_Desired_Imprint_Mask, GUI.py:963-1048).

        Coarse-to-fine search over shifts of the source rectangle
        ``rect = [x, y, w, h]`` in the desired Y image ([0, 255]): each
        candidate crop (+ its mask) is resized to ``target_dims`` (h, w),
        composited onto the current Y image at ``top_left`` (y, x), and
        scored by its out-of-quantization-bin DCT mass
        ``sum(max(0, |c - c_fixed| - 0.5))`` — the JPEG-consistency
        violation the imprint would force.  Stage 1 enumerates offsets
        -7..8 step 3 per coordinate and keeps the best 10; stage 2 refines
        with offsets -1..1.  Returns ``(best_rect, refined_mask)`` where
        ``refined_mask`` is the original rectangle's mask resized into the
        winning rectangle (GUI.py:1042-1047).
        """
        assert self.y_image is not None, 'open an image first'
        fixed = np.asarray(self.y_image[0, :, :, 0])
        from exsr.utils.misc import (resize_categorical_image,
                                     resize_scribble_image)
        fixed_coeffs = self.codec.compress(self.y_image, self._qf_arr(),
                                           q=self._q_arr(),
                                           quantize=True)
        ty, tx = top_left
        th, tw = target_dims
        orig_rect = np.asarray(rect, int)
        rect_mask_mean = float(desired_mask[
            rect[1]:rect[1] + rect[3], rect[0]:rect[0] + rect[2]].mean())
        min_overlap = 0.5 * rect_mask_mean

        def score(cands):
            imprints = []
            for c in cands:
                crop = resize_scribble_image(
                    desired_image_y[c[1]:c[1] + c[3], c[0]:c[0] + c[2]],
                    (th, tw))
                m = resize_categorical_image(
                    desired_mask[c[1]:c[1] + c[3], c[0]:c[0] + c[2]]
                    .astype(np.uint8), (th, tw), inclusive=True)
                comp = fixed.copy()
                comp[ty:ty + th, tx:tx + tw] = \
                    crop * m + comp[ty:ty + th, tx:tx + tw] * (1 - m)
                imprints.append(comp)
            # chunked like the reference's memory-backoff loop
            # (GUI.py:1019-1031), but bounded up front
            scores = []
            for i in range(0, len(imprints), 128):
                chunk = np.stack(imprints[i:i + 128])[..., None]
                coeffs = self.codec.compress(
                    jnp.asarray(chunk),
                    jnp.broadcast_to(self._qf_arr(), (chunk.shape[0],)),
                    quantize=False)
                viol = jnp.maximum(0.0,
                                   jnp.abs(coeffs - fixed_coeffs) - 0.5)
                scores.append(np.asarray(viol.sum(axis=(1, 2, 3))))
            return np.concatenate(scores)

        h_im, w_im = desired_image_y.shape[:2]
        rects = [orig_rect]
        for offsets, keep in ((range(-7, 9, 3), 10), ((-1, 0, 1), 1)):
            cands = []
            for r in rects:
                for dx in offsets:
                    for dy in offsets:
                        for dw in offsets:
                            for dh in offsets:
                                c = r + np.asarray([dx, dy, dw, dh])
                                if (c[:2] >= 0).all() and (c[2:] >= 4).all()\
                                        and c[0] + c[2] <= w_im \
                                        and c[1] + c[3] <= h_im:
                                    cands.append(c)
            cands = [c for c in cands if desired_mask[
                c[1]:c[1] + c[3], c[0]:c[0] + c[2]].mean() >= min_overlap]
            uniq = {tuple(c): c for c in cands}
            cands = list(uniq.values())
            order = np.argsort(score(cands))
            rects = [cands[i] for i in order[:keep]]
        best = rects[0]
        orig_mask = desired_mask[
            orig_rect[1]:orig_rect[1] + orig_rect[3],
            orig_rect[0]:orig_rect[0] + orig_rect[2]].astype(np.uint8)
        refined = np.zeros_like(desired_mask)
        refined[best[1]:best[1] + best[3], best[0]:best[0] + best[2]] = \
            resize_categorical_image(orig_mask, (best[3], best[2]),
                                     inclusive=True)
        return best, refined

    def optimize(self, objective: str, data: dict | None = None,
                 max_iters: int = 25, lr: float = 0.1,
                 n_alternatives: int = 1):
        """Gradient Z edit in the DCT-latent space.  'random_*'
        objectives with ``n_alternatives`` > 1 optimize a batch of
        diverse decodings and retain the extras for browsing/adoption
        (the reference's ProcessRandZ flow runs through the same
        task-agnostic Z_optimizer in the JPEG GUI, GUI.py:1476,1833)."""
        assert self.params is not None
        assert self.region_mask is not None and self.region_mask.sum() > 0, \
            'empty region selection — select a region (or invert back)'
        data = data or {}
        self._push()
        qf = self._qf_arr()
        b = n_alternatives if 'random' in objective else 1
        comp = (self.comp if b == 1 else
                jnp.repeat(self.comp, b, axis=0))

        def forward(z):
            coeffs = self._g_apply(self.params, comp, z)
            return jnp.clip(self.codec.extract(coeffs, qf,
                                               q=self._q_arr())
                            / 255.0, 0, 1)

        z0 = jnp.asarray(np.repeat(self.cur_z, b, axis=0))
        initial_out = np.asarray(forward(z0))
        mask = self.region_mask
        helpers = obj.STDHelpers.create(mask, local='local' in objective)
        initial_std = helpers(jnp.asarray(initial_out))
        name = objective.replace('local_', '')
        # 'max_' on a distance objective flips the loss sign — the
        # UnDesired_Im eval mode maximizes distance from the desired
        # image (Z_optimization.py:733-734); STD objectives carry their
        # own min/max semantics
        negate = name.startswith('max_') and 'STD' not in name
        if negate:
            name = name[len('max_'):]
        if 'scribble' in name:
            # the reference's scribble canvas also drives the JPEG GUI
            # (the block-smeared selection mask in
            # update_HR_mask_display_size exists for it, GUI.py:475-480);
            # strokes edit the decoded Y channel, brightness classes
            # scale Y directly (Y is the value channel here), TV-region
            # ids >3 get local-TV smoothing (Z_optimization.py:409-444)
            desired, l1_mask, tv_masks = self._scribble_targets_y(
                data, mask, initial_out)
            loss = obj.scribble(desired, l1_mask, tv_masks)
        elif 'l1' in name:
            loss = obj.l1_to_desired(jnp.asarray(data['desired']),
                                     jnp.asarray(mask))
        elif name in ('max_STD', 'min_STD', 'STD_increase', 'STD_decrease'):
            desired_std = None
            if 'crease' in name:
                inc = data.get('STD_increment', 0.03)
                desired_std = initial_std + (inc if 'increase' in name
                                             else -inc)
            loss = obj.std_objective(helpers, name, desired_std)
        elif 'TV' in name:
            loss = obj.tv_objective(helpers, initial_std)
        elif 'random' in name:
            # diversity across the batch of alternatives
            # (Z_optimization.py:683-701)
            loss = obj.diversity_objective(
                name,
                jnp.asarray(mask) if mask.min() < 1 else None,
                helpers=helpers if 'local' in objective else None,
                initial_std=initial_std,
                initial_image=(jnp.asarray(initial_out)
                               if 'limited' in name else None),
                rmse_weight=data.get('rmse_weight', 0.0))
        elif name == 'digit':
            # SVHN digit exploration — in the reference this tool is wired
            # in the JPEG GUI (SVHN classifier loaded only when JPEG_GUI,
            # GUI.py:1332,1393-1397; objective Z_optimization.py:551-601).
            # The Y-only output is replicated to the classifier's 3
            # channels inside the view transform's resize.  The target
            # label flows as a traced obj_arg so the 10-digit
            # Auto_Explore loop reuses ONE compiled graph.
            classifier = data['classifier_apply']
            ys, xs = np.nonzero(mask > 0)
            bounds = (int(ys.min()), int(xs.min()), int(ys.max()),
                      int(xs.max()))
            mvt = tuple(data.get('multiview_classification', (1, 3)))
            transform = obj.digit_views_transform(bounds, mvt)
            loss = obj.digit_objective_traced(classifier, transform)
            obj_args = {'digit': jnp.asarray(
                int(data['digit_2_resemble']), jnp.int32)}
            zo_key = ('digit', bounds, mvt, id(self.comp),
                      data.get('classifier_cache_key', id(classifier)))
        else:
            raise NotImplementedError(objective)
        if negate:
            loss = obj.negated(loss)

        if name == 'digit':
            cache = getattr(self, '_zo_cache', None)
            if cache is None:
                cache = self._zo_cache = {}
            if zo_key not in cache:
                cache[zo_key] = ZOptimizer(lambda z, a: forward(z),
                                           loss, lr=lr)
            zo = cache[zo_key]
        else:
            obj_args = None
            zo = ZOptimizer(forward, loss, lr=lr)
        theta0 = jnp.asarray(atanh_init(z0, 1.0))
        if b > 1:   # alternative seeds: keep the current Z, randomize rest
            from exsr.zopt.optimizer import xavier_uniform_like
            key = jax.random.PRNGKey(int(time.time() * 1e3) % (2 ** 31))
            rand = xavier_uniform_like(key, theta0)
            theta0 = jnp.concatenate([theta0[:1], rand[1:]], axis=0)
        bm = getattr(self, '_block_mask', None)
        z_mask = (jnp.asarray(bm[None, :, :, None]) if bm is not None
                  and bm.min() < 1 else None)
        z, theta, _, losses = zo.optimize(theta0, max_iters,
                                          z_mask=z_mask,
                                          frozen_theta=theta0,
                                          obj_args=obj_args)
        self.cur_z = np.asarray(z)[:1]
        if b > 1:
            self._alternatives = {'zs': np.asarray(z)[1:]}
        self.recompute()
        return {'out': self.out, 'losses': losses,
                'n_alternatives': b - 1 if b > 1 else 0}

    def _scribble_targets_y(self, data, mask, initial_out):
        """Y-channel desired image + masks for scribble/brightness edits —
        the SR flow (Z_optimization.py:409-423) with the HSV value-scaling
        collapsed onto Y itself (Y *is* the value channel of the Y-only
        decoded output)."""
        from exsr.utils.misc import scribble_mask_components
        scribble_mask = np.asarray(data['scribble_mask'])
        desired = np.asarray(data['desired'], np.float32)
        if desired.ndim == 3 and desired.shape[-1] == 3:
            # RGB strokes -> luma; match the session's open convention
            # (full-range JFIF Y for real-file opens, MATLAB studio-swing
            # for recompressed-RGB opens)
            if getattr(self, '_ycbcr_full_range', False):
                desired = desired @ np.array([0.299, 0.587, 0.114],
                                             np.float32)
            else:
                desired = rgb2ycbcr(desired, only_y=True)
        desired = np.asarray(desired, np.float32).squeeze()[None, ..., None]
        mult, l1_mask, tv_masks = scribble_mask_components(
            scribble_mask, mask, float(data.get('brightness_factor', 0.0)))
        if data.get('brightness_factor', 0.0):
            cur = np.clip(initial_out[0, :, :, 0], 0, 1)
            sel = (scribble_mask == 2) | (scribble_mask == 3)
            desired[0, :, :, 0] = np.where(
                sel, np.clip(cur * mult, 0, 1), desired[0, :, :, 0])
        return (jnp.asarray(desired), jnp.asarray(l1_mask),
                [jnp.asarray(m) for m in tv_masks])
