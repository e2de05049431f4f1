"""JPEG codec tests: round trips, quantization consistency, chroma model."""
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.jpeg.codec import (JPEGCodec, consistency_clamp, qf_to_factor,
                             scaled_q_table, zigzag_decode_q_table,
                             LUMA_Q_TABLE, ZIGZAG_ORDER)
from exsr.ops.dct import image_to_dct, dct_to_image, dct_matrix


def test_dct_round_trip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, size=(2, 32, 32, 1))
                      .astype(np.float32))
    coeffs = image_to_dct(img)
    back = dct_to_image(coeffs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-3)
    # orthonormality
    m = dct_matrix(8)
    np.testing.assert_allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_qf_scaling_libjpeg_convention():
    assert float(qf_to_factor(jnp.asarray([50.0]))[0]) == 100.0
    assert float(qf_to_factor(jnp.asarray([25.0]))[0]) == 200.0
    assert float(qf_to_factor(jnp.asarray([100.0]))[0]) == 0.0
    q = scaled_q_table(jnp.asarray([50.0]), LUMA_Q_TABLE)
    np.testing.assert_allclose(np.asarray(q[0, 0, 0]).reshape(8, 8),
                               LUMA_Q_TABLE)
    # QF=100 clamps every step to 1
    q100 = scaled_q_table(jnp.asarray([100.0]), LUMA_Q_TABLE)
    np.testing.assert_allclose(np.asarray(q100), 1.0)


def test_compress_extract_unquantized_identity():
    codec = JPEGCodec()
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, size=(1, 24, 24, 1))
                      .astype(np.float32))
    qf = jnp.asarray([30.0])
    coeffs = codec.compress(img, qf, quantize=False)
    back = codec.extract(coeffs, qf)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-2)


def test_quantized_round_trip_and_bin_consistency():
    codec = JPEGCodec()
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, size=(1, 16, 16, 1))
                      .astype(np.float32))
    qf = jnp.asarray([10.0])
    quantized = codec.compress(img, qf, quantize=True)
    # quantized coefficients are integers
    np.testing.assert_allclose(np.asarray(quantized),
                               np.round(np.asarray(quantized)), atol=1e-5)
    # true coefficients live within +-0.5 of the quantized ones
    true_coeffs = codec.compress(img, qf, quantize=False)
    assert float(jnp.abs(true_coeffs - quantized).max()) <= 0.5 + 1e-5
    # clamp is a no-op for already-consistent coefficients
    clamped = consistency_clamp(true_coeffs, quantized)
    np.testing.assert_allclose(np.asarray(clamped),
                               np.asarray(true_coeffs), atol=1e-6)
    # an arbitrary correction gets pulled into the bin
    wild = true_coeffs + 3.0
    clamped = consistency_clamp(wild, quantized)
    assert float(jnp.abs(clamped - quantized).max()) <= 0.5 + 1e-5


def test_chroma_pack_extract_shapes():
    codec = JPEGCodec(chroma_mode=True, block_size=16)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 32, 3))
                      .astype(np.float32))
    qf = jnp.asarray([20.0])
    packed = codec.compress_ycbcr(img, qf, downsample_or_quantize=True)
    assert packed.shape == (1, 2, 2, 256 + 128)
    out = codec.extract_ycbcr(packed, qf)
    assert out.shape == (1, 32, 32, 3)
    # Y channel (not quantized in this mode, JPEG.py:143-148) round-trips
    np.testing.assert_allclose(np.asarray(out[..., 0]),
                               np.asarray(img[..., 0]), atol=1e-2)
    # chroma reconstruction is low-passed: DC content preserved
    assert abs(float(out[..., 1].mean() - img[..., 1].mean())) < 2.0


def test_zigzag_decode():
    flat = np.arange(64)
    table = zigzag_decode_q_table(flat)
    # first zigzag entries: (0,0)=0, (0,1)=1, (1,0)=2, (2,0)=3, (1,1)=4
    assert table[0, 0] == 0 and table[0, 1] == 1 and table[1, 0] == 2
    assert table[2, 0] == 3 and table[1, 1] == 4
    assert sorted(table.reshape(-1)) == list(range(64))


def test_chroma_dct_wipe_models_subsampling():
    """The reference's chroma-remodeling experiment
    (scripts/JPEG_chroma_remodeling_test.py): modeling JPEG's 2x2 chroma
    subsampling as wiping the 16x16-DCT coefficients outside the
    low-frequency 8x8 quadrant is a faithful stand-in — on smooth
    (natural-statistics) chroma the wipe reconstruction is far closer to
    the original than nearest-neighbor-upsampled real subsampling is, and
    the wiped-away high-frequency energy portion is small."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    h = w = 64
    ycbcr = np.zeros((h, w, 3), np.float32)
    ycbcr[..., 0] = rng.uniform(0, 255, (h, w))   # luma may be rough
    for c in (1, 2):
        ycbcr[..., c] = gaussian_filter(
            rng.uniform(0, 255, (h, w)), 3.0)
    img = jnp.asarray(ycbcr[None])
    codec16 = JPEGCodec(chroma_mode=True, block_size=16)
    qf = jnp.asarray([90.0])
    packed = codec16.compress_ycbcr(
        img, qf, downsample_or_quantize='downsample_only')
    recon = np.asarray(codec16.extract_ycbcr(packed, qf))[0]
    # luma is untouched by the chroma wipe
    assert np.sqrt(np.mean((recon[..., 0] - ycbcr[..., 0]) ** 2)) < 1e-3
    # wipe model ~= original on smooth chroma (measured 0.16 gray levels)
    rmse_wipe = np.sqrt(np.mean((recon[..., 1:] - ycbcr[..., 1:]) ** 2))
    assert rmse_wipe < 0.5
    # ... and is much closer than NN-upsampled real 2x2 subsampling
    sub = ycbcr[::2, ::2, 1:]
    nn = np.repeat(np.repeat(sub, 2, 0), 2, 1)
    rmse_nn = np.sqrt(np.mean((nn - ycbcr[..., 1:]) ** 2))
    assert rmse_wipe < 0.5 * rmse_nn
    # high-frequency chroma energy portion is small even on rougher chroma
    rough = ycbcr.copy()
    for c in (1, 2):
        rough[..., c] = gaussian_filter(
            rng.uniform(0, 255, (h, w)), 1.0)
    full = np.asarray(codec16.compress_ycbcr(
        jnp.asarray(rough[None]), qf, downsample_or_quantize=False))
    cb = full[0, ..., 256:512].reshape(-1, 16, 16)
    hf_portion = 1 - (cb[:, :8, :8] ** 2).sum() / (cb ** 2).sum()
    assert 0 <= hf_portion < 0.1
