"""Conformance tests for the pure-numpy baseline JPEG codec
(functions/jpeg.py). The oracle-gated query (multimodal_jpeg_decode)
covers the DC-only closed-form corpus; these pin everything the oracle
can't see: AC coefficients against an independent IDCT reference,
4:4:4 color, byte stuffing, interleaved 4:2:0 MCU scan on a genuine
foreign-encoder file, cropping, and precise out-of-scope errors.
"""

import numpy as np
import pytest

from uts_spark.functions.jpeg import (
    FLAT_Q16,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    idct2,
    synth_jpeg,
    synth_jpeg_params,
)

PYTHON_JPG = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/"
    "python.jpg"
)


def _reference_gray(coeffs):
    """Independent reconstruction: dequantize + idct2 + shift +
    round-half-up + clamp, built directly from the arrays (no shared
    code path with decode_jpeg's entropy/scan machinery)."""
    bh, bw = coeffs.shape[:2]
    q = np.zeros((8, 8))
    for i, (r, c) in enumerate(ZIGZAG):
        q[r, c] = FLAT_Q16[i]
    ref = np.zeros((bh * 8, bw * 8))
    for y in range(bh):
        for x in range(bw):
            ref[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                idct2(coeffs[y, x] * q) + 128.0
            )
    return np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)


def test_dc_only_closed_form():
    for doc_id in (0, 1, 7, 42, 95, 123, 9999):
        bw, bh, a, b, c = synth_jpeg_params(doc_id)
        img = decode_jpeg(synth_jpeg(doc_id))
        assert img.shape == (bh * 8, bw * 8)
        for y in range(bh):
            for x in range(bw):
                k = ((x * a + y * b + c) % 96) - 48
                blk = img[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8]
                assert (blk == 128 + 2 * k).all()


def test_ac_coefficients_roundtrip_vs_reference():
    rng = np.random.RandomState(7)
    for _ in range(25):
        bh, bw = rng.randint(1, 4), rng.randint(1, 4)
        coeffs = np.zeros((bh, bw, 8, 8), dtype=np.int32)
        for y in range(bh):
            for x in range(bw):
                for _ in range(rng.randint(0, 14)):
                    coeffs[y, x, rng.randint(0, 8), rng.randint(0, 8)] = (
                        rng.randint(-120, 121)
                    )
        img = decode_jpeg(encode_jpeg(coeffs, bw * 8, bh * 8, FLAT_Q16, 1))
        assert (img == _reference_gray(coeffs)).all()


def test_byte_stuffing_is_exercised_and_decodes():
    # this seed hits an encoded 0xFF (verified: stuffed 0x00 present)
    rng = np.random.RandomState(0)
    coeffs = np.zeros((1, 1, 8, 8), dtype=np.int32)
    for _ in range(rng.randint(1, 20)):
        coeffs[0, 0, rng.randint(0, 8), rng.randint(0, 8)] = rng.randint(
            -120, 121
        )
    data = encode_jpeg(coeffs, 8, 8, FLAT_Q16, 1)
    assert b"\xff\x00" in data.split(b"\xff\xda")[1]
    assert (decode_jpeg(data) == _reference_gray(coeffs)).all()


def test_color_444():
    coeffs = np.zeros((3, 2, 2, 8, 8), dtype=np.int32)
    coeffs[0, :, :, 0, 0] = 10
    coeffs[1, 0, 0, 0, 0] = 5
    coeffs[2, 1, 1, 1, 1] = -7
    img = decode_jpeg(encode_jpeg(coeffs, 16, 16, FLAT_Q16, 3))
    assert img.shape == (16, 16, 3)
    # Y=10*16/8=20 → luma 148; neutral chroma blocks stay gray
    assert (img[8:, :8] == 148).all()


def test_partial_block_crop():
    coeffs = np.zeros((2, 2, 8, 8), dtype=np.int32)
    coeffs[:, :, 0, 0] = [[4, 8], [12, 16]]
    img = decode_jpeg(encode_jpeg(coeffs, 10, 12, FLAT_Q16, 1))
    assert img.shape == (12, 10)
    assert img[0, 0] == 128 + 8 and img[11, 9] == 128 + 32


def test_foreign_encoder_420_fixture():
    """python.jpg ships with CPython's test suite: baseline 4:2:0
    (sampling 0x22/0x11/0x11) from a real-world encoder. Decoding it
    exercises the interleaved MCU scan, multi-table DQT/DHT management,
    and chroma upsampling on bytes this repo did not produce. The
    pixel stats are pinned as a snapshot: any decoder regression
    (table select, MCU order, upsample, color transform) moves them."""
    with open(PYTHON_JPG, "rb") as f:
        img = decode_jpeg(f.read())
    assert img.shape == (16, 16, 3)
    assert int(img.sum()) == 70965
    assert [round(m, 2) for m in img.mean(axis=(0, 1))] == [
        98.13, 102.47, 76.61
    ]


def test_out_of_scope_raises_precisely():
    with pytest.raises(ValueError, match="progressive"):
        with open("/usr/share/doc/nodejs/thin-white-stripe.jpg", "rb") as f:
            decode_jpeg(f.read())
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"not a jpeg")
