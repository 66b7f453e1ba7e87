"""Tests for the pure-stdlib PNG codec (`operators/png.py`).

The encoder only emits filters None/Sub/Up, so the decoder's Average,
Paeth and palette paths are pinned with streams built independently in
the tests: the FORWARD filter math comes straight from the spec
(implemented here, not imported), the stream is zlib-compressed and
chunk-wrapped by hand, and the decoder must reproduce the source image
bit-for-bit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from march_mania_spark_lakehouse_spark.operators import png


def _wrap(ihdr_body: bytes, extra_chunks: list[tuple[bytes, bytes]],
          raw_filtered: bytes) -> bytes:
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    for tag, body in extra_chunks:
        out += chunk(tag, body)
    out += chunk(b"IDAT", zlib.compress(raw_filtered)) + chunk(b"IEND", b"")
    return out


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Spec-direction (encode-side) filtering, written from the spec in
    this test file — NOT the module's code."""
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = rows[y]
        filt = np.zeros_like(cur)
        for i in range(w * c):
            a = int(cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ftype == 3:  # Average
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[i] = (int(cur[i]) - pred) & 0xFF
        out.append(ftype)
        out += filt.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def test_roundtrip_exact_grey_rgb_rgba():
    rng = np.random.default_rng(11)
    for shape in [(9, 14), (21, 8, 3), (6, 30, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = png.decode(png.encode(px))
        assert dec.shape == px.shape
        assert (dec == px).all()


def test_roundtrip_exact_every_grey_level_and_compresses():
    row = np.arange(256, dtype=np.uint8).reshape(1, 256)
    img = np.repeat(row, 16, axis=0)
    enc = png.encode(img)
    assert (png.decode(enc) == img).all()
    assert len(enc) < img.size  # really compressed (Sub filter → zeros)


def test_average_filter_decodes_hand_built_stream():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    payload = _wrap(
        struct.pack(">IIBBBBB", 11, 7, 8, 2, 0, 0, 0), [],
        _forward_filter(img, 3),
    )
    assert (png.decode(payload) == img).all()


def test_paeth_filter_decodes_hand_built_stream():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    payload = _wrap(
        struct.pack(">IIBBBBB", 9, 8, 8, 2, 0, 0, 0), [],
        _forward_filter(img, 4),
    )
    assert (png.decode(payload) == img).all()


def test_palette_with_trns_decodes():
    """2×3 palette image: indices 0..2, PLTE maps them to primaries,
    tRNS makes index 0 transparent."""
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    payload = _wrap(
        struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0),
        [(b"PLTE", plte), (b"tRNS", bytes([0]))],
        raw,
    )
    out = png.decode(payload)
    assert out.shape == (2, 3, 4)
    assert tuple(out[0, 0]) == (255, 0, 0, 0)      # transparent red
    assert tuple(out[0, 1]) == (0, 255, 0, 255)
    assert tuple(out[1, 0]) == (0, 0, 255, 255)


def test_crc_corruption_detected():
    enc = bytearray(png.encode(np.zeros((4, 4), dtype=np.uint8)))
    enc[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError):
        png.decode(bytes(enc))


def test_rejects_unsupported_and_non_png():
    with pytest.raises(ValueError):
        png.decode(b"not a png at all....")
    sixteen = _wrap(struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0), [], b"")
    with pytest.raises(NotImplementedError):
        png.decode(sixteen)
    interlaced = _wrap(struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1), [], b"")
    with pytest.raises(NotImplementedError):
        png.decode(interlaced)


def test_decode_real_dispatches_png():
    from march_mania_spark_lakehouse_spark.operators.multimodal import decode_real

    px = np.full((10, 12, 3), 60, dtype=np.uint8)
    fmt, w, h, feat = decode_real(png.encode(px))
    assert (fmt, w, h) == ("png", 12, 10)
    assert np.allclose(feat, 60.0 / 255.0, atol=1e-3)


def test_resize_real_accepts_png(spark):
    from march_mania_spark_lakehouse_spark.operators.multimodal import (
        decode_bmp,
        resize_image_real,
    )

    px = np.zeros((20, 20, 3), dtype=np.uint8)
    px[:, 10:] = 240  # right half bright; lossless so edges stay crisp
    df = spark.createDataFrame(
        [(1, bytearray(png.encode(px)))], "media_id long, payload binary"
    )
    out = decode_bmp(bytes(
        resize_image_real(df, target_w=4, target_h=4).collect()[0]["payload"]
    ))
    assert out.shape == (4, 4, 3)
    assert (out[:, 2:] == 240).all() and (out[:, :2] == 0).all()
