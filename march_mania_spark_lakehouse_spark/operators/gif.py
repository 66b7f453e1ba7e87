"""From-scratch GIF codec — pure stdlib + numpy, no imaging library.

GIF (GIF89a, the public W3C/CompuServe spec) completes the crawl-media
codec family with the one compression algorithm the repo didn't have
yet: variable-width LZW over palette indices. Implemented per spec:

- logical screen descriptor + global color table;
- image descriptor (optional interlace — the 8/8/4/2 four-pass row
  order) and optional local color table;
- LZW with growing code width (min_code_size+1 … 12 bits), CLEAR and
  EOI codes, 255-byte sub-block framing, little-endian bit packing;
- extensions (graphic control etc.) parsed and skipped; only the
  FIRST image of an animation is decoded (frame features for training
  pipelines sample frames anyway).

GIF is lossless over its palette, so round trips are BIT-EXACT — the
test contract is exact equality on random content (the codec-sweep
policy from the JPEG zigzag lesson), and the q201 oracle pins the
whole encode→decode chain against closed-form pixel arithmetic.

Scale posture: like the other codecs this is map-only worker code —
`multimodal.decode_real` dispatches on the magic bytes inside
Arrow-batched `mapInPandas`, nothing but feature rows cross the wire.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def _interlace_order(height: int) -> list[int]:
    out = []
    for start, step in _INTERLACE_PASSES:
        out.extend(range(start, height, step))
    return out


# --------------------------------------------------------------------------
# LZW (spec Appendix F): variable-width codes, little-endian bit stream
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        return bytes(self.bytes)


def lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR first, grows code width at dict size
    2^w, re-CLEARs at 4096 (the spec maximum), ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    w = _BitWriter()
    w.write(clear, width)
    prefix = b""
    for v in indices.tolist():
        sym = bytes([v])
        cand = prefix + sym
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code >= 4096:
            w.write(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = sym
    if prefix:
        w.write(table[prefix], width)
    w.write(eoi, width)
    return w.finish()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> "np.ndarray":
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    pos = 0  # bit position
    table: list[bytes] = []
    width = min_code_size + 1
    prev: "bytes | None" = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    total_bits = len(data) * 8
    while pos + width <= total_bits:
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0: byte0 + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        if n_out + len(entry) > n_expected:
            entry = entry[: n_expected - n_out]
        out[n_out: n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if n_out >= n_expected:
            break
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if n_out != n_expected:
        raise ValueError(f"LZW stream ended at {n_out}/{n_expected} pixels")
    return out


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i: i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


# --------------------------------------------------------------------------
# Encode / decode
# --------------------------------------------------------------------------


def encode(
    pixels: "np.ndarray",
    palette: "np.ndarray | None" = None,
    interlace: bool = False,
) -> bytes:
    """Encode indexed pixels (h, w) uint8 + palette (n, 3) uint8 — or a
    greyscale image (palette defaults to the 256-level grey ramp) — as
    a single-image GIF89a with a global color table."""
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    if pixels.ndim != 2:
        raise ValueError("encode takes palette-indexed (h, w) pixels")
    h, w = pixels.shape
    n = len(palette)
    depth = max(1, int(np.ceil(np.log2(max(n, 2)))))
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[:n] = palette
    header = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    rows = pixels[_interlace_order(h)] if interlace else pixels
    min_code = max(2, depth)
    data = lzw_encode(rows.reshape(-1), min_code)
    image = (
        struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([min_code])
        + _sub_blocks(data)
    )
    return header + gct.tobytes() + image + b"\x3b"


def decode(payload: bytes) -> "np.ndarray":
    """Decode the FIRST image of a GIF to (h, w, 3) uint8 RGB.
    Handles global/local color tables, interlace, extensions."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos)
        gct = gct.reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            _, left, top, w, h, iflags = struct.unpack_from("<BHHHHB", payload, pos)
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    payload, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("no color table for image")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data.extend(payload[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
            if iflags & 0x40:
                deinter = np.empty_like(idx)
                deinter[_interlace_order(h)] = idx
                idx = deinter
            return table[idx]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
    raise ValueError("GIF has no image data")
