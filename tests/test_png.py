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


def test_rejects_illegal_and_non_png():
    with pytest.raises(ValueError):
        png.decode(b"not a png at all....")
    # 16-bit palette is illegal per spec Table 11.1 (depth gates are
    # now capability-complete, so only truly-illegal combos reject)
    bad = _wrap(struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0), [], b"")
    with pytest.raises(ValueError):
        png.decode(bad)
    # 2-bit RGB likewise
    bad = _wrap(struct.pack(">IIBBBBB", 2, 2, 2, 2, 0, 0, 0), [], b"")
    with pytest.raises(ValueError):
        png.decode(bad)


def test_16bit_roundtrip_grey_rgb_rgba():
    """uint16 input → 16-bit PNG → uint16 back, bit-exact, plain and
    Adam7-interlaced, including dims that make partial/empty passes."""
    rng = np.random.default_rng(11)
    for shape in ((1, 1), (3, 5), (9, 10), (23, 17, 3), (16, 16, 4)):
        px = rng.integers(0, 65536, shape).astype(np.uint16)
        for inter in (False, True):
            dec = png.decode(png.encode(px, interlace=inter))
            assert dec.dtype == np.uint16
            assert np.array_equal(dec, px), (shape, inter)


def test_adam7_interlaced_8bit_roundtrip():
    rng = np.random.default_rng(5)
    for shape in ((1, 1), (2, 2), (7, 1), (1, 9, 3), (8, 8), (13, 21, 3),
                  (9, 10, 4)):
        px = rng.integers(0, 256, shape).astype(np.uint8)
        dec = png.decode(png.encode(px, interlace=True))
        assert np.array_equal(dec, px), shape


def _pack_rows(rows: list[bytes]) -> bytes:
    out = bytearray()
    for r in rows:
        out.append(0)  # filter None
        out += r
    return bytes(out)


def test_4bit_greyscale_exact_expansion():
    """4-bit grey samples expand to 8-bit by exactly ×17 (255/15)."""
    vals = np.arange(9).reshape(3, 3)
    rows = [bytes([(r[0] << 4) | r[1], r[2] << 4]) for r in vals]
    stream = _wrap(struct.pack(">IIBBBBB", 3, 3, 4, 0, 0, 0, 0), [],
                   _pack_rows(rows))
    assert np.array_equal(png.decode(stream), (vals * 17).astype(np.uint8))


def test_1bit_greyscale_stripes():
    bits = np.array([[1, 0] * 5, [0, 1] * 5], dtype=np.uint8)
    rows = [np.packbits(r).tobytes() for r in bits]
    stream = _wrap(struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0), [],
                   _pack_rows(rows))
    assert np.array_equal(png.decode(stream), bits * 255)


def test_2bit_palette_lookup():
    """Sub-byte palette indices select PLTE entries without scaling."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    rows = [bytes([(r[0] << 6) | (r[1] << 4) | (r[2] << 2)]) for r in idx]
    stream = _wrap(struct.pack(">IIBBBBB", 3, 2, 2, 3, 0, 0, 0),
                   [(b"PLTE", plte)], _pack_rows(rows))
    exp = np.frombuffer(plte, np.uint8).reshape(4, 3)[idx]
    assert np.array_equal(png.decode(stream), exp)


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
