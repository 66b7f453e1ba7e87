"""PNG codec in pure numpy + stdlib — no external libraries.

Companion to `operators/jpeg.py`: PNG's compression layer is zlib
DEFLATE, which IS in the Python standard library, so the whole format
(RFC 2083 / W3C PNG spec) is implementable without external codecs —
closing the second honestly-stubbed image format in
`operators/multimodal.py`. Unlike JPEG this is lossless, so round trips
are bit-exact by construction and value oracles need no solid-color
trick.

Scope:

- **Encoder**: 8-bit greyscale, RGB or RGBA; per-row filter chosen
  greedily between None/Sub/Up (the minimum-sum-of-absolutes heuristic
  every real encoder uses); single IDAT.
- **Decoder**: 8-bit greyscale / grey+alpha / RGB / RGBA / palette
  (PLTE, with optional tRNS alpha), all five filter types, multiple
  IDAT chunks, CRC-verified chunk stream. 16-bit, 1/2/4-bit depths and
  Adam7 interlacing raise NotImplementedError — different unpack
  pipelines, stated rather than faked.

Unfiltering is inherently row-sequential (each row depends on the
previous), but each row's arithmetic is vectorized; Paeth is the only
per-pixel-sequential filter and is applied column-vectorized with a
row-scan loop, which is fine at Arrow-batch fixture sizes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode (h, w) greyscale, (h, w, 3) RGB or (h, w, 4) RGBA uint8
    as a PNG. Lossless: ``decode(encode(x)) == x`` exactly."""
    if pixels.ndim == 2:
        color_type, arr = 0, pixels[:, :, None]
    elif pixels.shape[2] == 3:
        color_type, arr = 2, pixels
    elif pixels.shape[2] == 4:
        color_type, arr = 6, pixels
    else:
        raise ValueError(f"unsupported channel count {pixels.shape[2]}")
    h, w, c = arr.shape
    rows = arr.reshape(h, w * c).astype(np.int16)
    # per-row greedy filter: None(0) vs Sub(1) vs Up(2) by min Σ|v|
    # of the filtered bytes interpreted as signed — the spec's own
    # recommended heuristic.
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        row = rows[y]
        sub = row.copy()
        sub[c:] -= row[:-c]
        up = row - prev
        candidates = (
            (0, row),
            (1, sub),
            (2, up),
        )
        ft, best = min(
            candidates,
            key=lambda t: int(np.abs(((t[1] % 256) + 128) % 256 - 128).sum()),
        )
        out.append(ft)
        out += (best % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _chunk(b"IEND", b"")
    )


def _paeth_unfilter(cur: np.ndarray, prev: np.ndarray, c: int) -> np.ndarray:
    """Unfilter one Paeth row: vectorized over channels, sequential over
    pixels (each reconstructed pixel feeds the next predictor)."""
    n = cur.shape[0]
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        a = out[i - c] if i >= c else 0
        b = int(prev[i])
        cc = int(prev[i - c]) if i >= c else 0
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = cc
        out[i] = (int(cur[i]) + pred) & 0xFF
    return out


def decode(payload: bytes) -> np.ndarray:
    """Decode a PNG to (h, w) greyscale or (h, w, 3)/(h, w, 4) uint8.
    CRC-checked; raises ValueError for non-PNG / corrupt streams and
    NotImplementedError for 16-bit, sub-byte depths, or interlacing."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = bit_depth = color_type = interlace = None
    palette = None
    trns = None
    while pos < len(payload):
        length, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8: pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise NotImplementedError(f"{bit_depth}-bit PNG")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing")
            if color_type not in _CHANNELS:
                raise ValueError(f"bad color type {color_type}")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = data[:, 0]
    rows = data[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft, cur = int(filters[y]), rows[y]
        if ft == 0:  # None
            rec = cur.copy()
        elif ft == 1:  # Sub: rec = running per-channel sum (mod 256)
            rec = (cur.reshape(w, c).cumsum(axis=0, dtype=np.int64) % 256).reshape(
                stride
            )
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - c] if i >= c else 0
                rec[i] = (rec[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = _paeth_unfilter(cur, prev, c)
        else:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, c)
    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = img[..., 0]
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, dtype=np.uint8)
            mask = idx < len(trns)
            alpha[mask] = trns[idx[mask]]
            return np.concatenate([rgb, alpha[..., None]], axis=-1)
        return rgb
    if c == 1:
        return img[..., 0]
    if color_type == 4:  # grey + alpha → (h, w, 2) kept as-is
        return img
    return img
