"""Unit tests for the pure-numpy baseline JPEG codec
(seriesly_spark/operators/jpeg.py) — the lossy sibling of the PPM/PNG
round-trip tests in test_multimodal."""

import numpy as np
import pytest

from seriesly_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_scale,
    STD_LUMA_Q,
)
from seriesly_spark.operators.multimodal import decode_image


def _gradient(h, w):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return np.clip(60 + r * 2 + c, 0, 255).astype(np.uint8)


def test_zigzag_is_a_permutation_with_the_spec_prefix():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # T.81 figure A.6: (0,0), (0,1), (1,0), (2,0), (1,1), (0,2), ...
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_quality_50_keeps_annex_k_table_verbatim():
    assert (quality_scale(STD_LUMA_Q, 50) == STD_LUMA_Q).all()
    assert (quality_scale(STD_LUMA_Q, 100) == 1).all()
    assert (quality_scale(STD_LUMA_Q, 25) >= STD_LUMA_Q).all()


def test_block_constant_even_grayscale_roundtrips_exactly_at_q50():
    # Constant 8x8 blocks quantise to a lone DC coefficient; with the
    # Annex-K DC step of 16 and even values, round(8*(g-128)/16) is
    # exact — the property the jpeg_decode_stats oracle relies on.
    arr = np.zeros((16, 24), dtype=np.uint8)
    vals = [0, 42, 100, 128, 200, 254]
    for i, v in enumerate(vals):
        by, bx = divmod(i, 3)
        arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    out = decode_jpeg(encode_jpeg(arr, quality=50))
    assert out.shape == (16, 24, 3)
    for ch in range(3):
        assert (out[:, :, ch] == arr).all()


def test_smooth_grayscale_roundtrip_error_is_small():
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 3


def test_rgb_444_and_420_roundtrip_on_smooth_image():
    h, w = 32, 48
    base = _gradient(h, w).astype(int)
    img = np.stack(
        [base, np.clip(base + 30, 0, 255), np.clip(255 - base, 0, 255)],
        axis=2,
    ).astype(np.uint8)
    for sub, tol in (("4:4:4", 6), ("4:2:0", 12)):
        out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= tol, (sub, err)


def test_constant_color_420_is_exact_after_color_transform():
    img = np.full((32, 48, 3), [120, 200, 40], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_non_mcu_aligned_dimensions_crop_back():
    img = _gradient(37, 53)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling=sub))
        assert out.shape == (37, 53, 3)
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 8


def test_decode_image_dispatches_on_jpeg_magic():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = encode_jpeg(img, quality=50)
    assert payload[:2] == b"\xff\xd8"
    out = decode_image(payload)
    assert (out == 100).all()


def test_strict_errors():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = encode_jpeg(img, quality=50)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(payload[:40])  # truncated mid-segment
    # flip SOF0 to SOF2 (progressive): decoder must refuse, not
    # mis-decode. The SOF0 marker is the first 0xFF 0xC0 pair.
    prog = bytearray(payload)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        encode_jpeg(img.astype(np.int32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 8), dtype=np.uint8))


def test_decoder_reads_tables_from_the_stream_not_assumptions():
    # Re-encode at an unusual quality: the quant tables in the DQT
    # segment differ from Annex-K, and the decoder must still invert
    # exactly what the encoder applied.
    img = _gradient(24, 24)
    for q in (33, 77):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 255 // 10  # lossy, but sane
