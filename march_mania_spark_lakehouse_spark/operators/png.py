"""PNG codec in pure numpy + stdlib — no external libraries.

Companion to `operators/jpeg.py`: PNG's compression layer is zlib
DEFLATE, which IS in the Python standard library, so the whole format
(RFC 2083 / W3C PNG spec) is implementable without external codecs —
closing the second honestly-stubbed image format in
`operators/multimodal.py`. Unlike JPEG this is lossless, so round trips
are bit-exact by construction and value oracles need no solid-color
trick.

Scope:

- **Encoder**: greyscale, RGB or RGBA at 8-bit (uint8 input) or 16-bit
  (uint16 input) depth, optionally Adam7-interlaced; per-row filter
  chosen greedily between None/Sub/Up (the minimum-sum-of-absolutes
  heuristic every real encoder uses); single IDAT.
- **Decoder**: every legal depth/color-type combination — 1/2/4/8-bit
  greyscale and palette (PLTE, optional tRNS alpha), 8/16-bit
  greyscale / grey+alpha / RGB / RGBA — plus Adam7 interlacing, all
  five filter types, multiple IDAT chunks, CRC-verified chunk stream.
  16-bit images decode to uint16 (no precision loss); 1/2/4-bit
  greyscale is expanded to 8-bit by the exact 255/(2^d−1) factor.

Unfiltering is inherently row-sequential (each row depends on the
previous), but each row's arithmetic is vectorized; Paeth is the only
per-pixel-sequential filter and is applied column-vectorized with a
row-scan loop, which is fine at Arrow-batch fixture sizes. Filters
operate on the byte stream with the spec's bpp offset
(max(1, channels·depth/8)), so one unfilter routine serves every
depth; Adam7 treats each of the seven passes as an independent
sub-image and scatters it into the output grid.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: legal bit depths per color type (PNG spec, Table 11.1)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 pass grid: (x0, y0, dx, dy) — pass k covers pixels
#: (x0 + i·dx, y0 + j·dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_pass(byte_rows: np.ndarray, bpp: int) -> bytearray:
    """Greedy per-row filtering (None/Sub/Up by min Σ|signed byte|) of
    one (inter)lace pass's byte matrix."""
    out = bytearray()
    n_rows, row_bytes = byte_rows.shape
    prev = np.zeros(row_bytes, dtype=np.int16)
    for y in range(n_rows):
        row = byte_rows[y].astype(np.int16)
        sub = row.copy()
        sub[bpp:] -= row[:-bpp]
        up = row - prev
        candidates = ((0, row), (1, sub), (2, up))
        ft, best = min(
            candidates,
            key=lambda t: int(np.abs(((t[1] % 256) + 128) % 256 - 128).sum()),
        )
        out.append(ft)
        out += (best % 256).astype(np.uint8).tobytes()
        prev = row
    return out


def _to_byte_rows(arr: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, c) samples → (h, w·c·depth/8) big-endian byte rows."""
    h, w, c = arr.shape
    if depth == 8:
        return arr.reshape(h, w * c).astype(np.uint8)
    flat = arr.reshape(h, w * c).astype(np.uint16)
    rows = np.zeros((h, w * c * 2), dtype=np.uint8)
    rows[:, 0::2] = flat >> 8
    rows[:, 1::2] = flat & 0xFF
    return rows


def encode(pixels: np.ndarray, level: int = 6, interlace: bool = False) -> bytes:
    """Encode (h, w) greyscale, (h, w, 3) RGB or (h, w, 4) RGBA as a
    PNG — uint8 input → 8-bit, uint16 input → 16-bit; ``interlace``
    emits the seven Adam7 passes. Lossless: ``decode(encode(x)) == x``
    exactly (same dtype back)."""
    depth = 16 if pixels.dtype == np.uint16 else 8
    if pixels.ndim == 2:
        color_type, arr = 0, pixels[:, :, None]
    elif pixels.shape[2] == 3:
        color_type, arr = 2, pixels
    elif pixels.shape[2] == 4:
        color_type, arr = 6, pixels
    else:
        raise ValueError(f"unsupported channel count {pixels.shape[2]}")
    h, w, c = arr.shape
    bpp = c * depth // 8
    out = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            out += _filter_pass(_to_byte_rows(sub, depth), bpp)
    else:
        out += _filter_pass(_to_byte_rows(arr, depth), bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _chunk(b"IEND", b"")
    )


def _paeth_unfilter(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter one Paeth row: vectorized over channels, sequential over
    pixels (each reconstructed pixel feeds the next predictor)."""
    n = cur.shape[0]
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = int(prev[i])
        cc = int(prev[i - bpp]) if i >= bpp else 0
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


def _unfilter_pass(raw: bytes, ph: int, row_bytes: int, bpp: int) -> np.ndarray:
    """One pass's filtered scanlines → (ph, row_bytes) reconstructed
    bytes. Filters address the byte stream at offset ``bpp`` per spec,
    which makes this routine depth-agnostic."""
    data = np.frombuffer(raw, dtype=np.uint8).reshape(ph, row_bytes + 1)
    filters = data[:, 0]
    rows = data[:, 1:].astype(np.int32)
    out = np.zeros((ph, row_bytes), dtype=np.int32)
    prev = np.zeros(row_bytes, dtype=np.int32)
    for y in range(ph):
        ft, cur = int(filters[y]), rows[y]
        if ft == 0:  # None
            rec = cur.copy()
        elif ft == 1:  # Sub: rec = running per-bpp-unit sum (mod 256)
            rec = (
                cur.reshape(-1, bpp).cumsum(axis=0, dtype=np.int64) % 256
            ).reshape(row_bytes)
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            rec = cur.copy()
            for i in range(row_bytes):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = _paeth_unfilter(cur, prev, bpp)
        else:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y] = rec
        prev = rec
    return out


def _bytes_to_samples(
    rec: np.ndarray, pw: int, c: int, depth: int
) -> np.ndarray:
    """(ph, row_bytes) reconstructed bytes → (ph, pw, c) samples at the
    stream's depth (uint16 for 16-bit, raw small ints otherwise)."""
    ph = rec.shape[0]
    u8 = rec.astype(np.uint8)
    if depth == 8:
        return u8.reshape(ph, pw, c)
    if depth == 16:
        hi = u8[:, 0::2].astype(np.uint16)
        lo = u8[:, 1::2].astype(np.uint16)
        return ((hi << 8) | lo).reshape(ph, pw, c)
    # sub-byte: MSB-first bit groups, row-padded to whole bytes
    bits = np.unpackbits(u8, axis=1)[:, : pw * c * depth]
    groups = bits.reshape(ph, pw * c, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (groups @ weights).reshape(ph, pw, c)


def decode(payload: bytes) -> np.ndarray:
    """Decode a PNG to (h, w) greyscale or (h, w, {2,3,4}) pixels —
    uint8 for depths ≤ 8 (1/2/4-bit greyscale exactly expanded by
    255/(2^d−1)), uint16 for 16-bit streams. Handles Adam7 interlacing
    and palette (PLTE/tRNS). CRC-checked; raises ValueError for
    non-PNG / corrupt streams."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = depth = color_type = interlace = None
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
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color_type not in _CHANNELS:
                raise ValueError(f"bad color type {color_type}")
            if depth not in _LEGAL_DEPTHS[color_type]:
                raise ValueError(
                    f"illegal depth {depth} for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
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
    bpp = max(1, c * depth // 8)
    raw = zlib.decompress(bytes(idat))
    img = np.zeros((h, w, c), dtype=np.uint16 if depth == 16 else np.uint8)
    passes = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        row_bytes = (pw * c * depth + 7) // 8
        n = ph * (row_bytes + 1)
        if off + n > len(raw):
            raise ValueError("decompressed size mismatch")
        rec = _unfilter_pass(raw[off: off + n], ph, row_bytes, bpp)
        off += n
        img[y0::dy, x0::dx] = _bytes_to_samples(rec, pw, c, depth)
    if off != len(raw):
        raise ValueError("decompressed size mismatch")
    if color_type == 3:  # palette: indices at any depth, no scaling
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = img[..., 0].astype(np.uint8)
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, dtype=np.uint8)
            mask = idx < len(trns)
            alpha[mask] = trns[idx[mask]]
            return np.concatenate([rgb, alpha[..., None]], axis=-1)
        return rgb
    if color_type == 0 and depth < 8:
        # exact 8-bit expansion: 255/(2^d−1) is integral for d=1,2,4
        img = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if c == 1:
        return img[..., 0]
    return img  # grey+alpha (h,w,2), RGB (h,w,3), RGBA (h,w,4)
