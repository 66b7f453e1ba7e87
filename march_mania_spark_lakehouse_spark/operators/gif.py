"""From-scratch GIF codec — pure stdlib + numpy, no imaging library.

GIF (GIF89a, the public W3C/CompuServe spec) completes the crawl-media
codec family with the one compression algorithm the repo didn't have
yet: variable-width LZW over palette indices. Implemented per spec:

- logical screen descriptor + global color table;
- image descriptor (optional interlace — the 8/8/4/2 four-pass row
  order) and optional local color table;
- LZW with growing code width (min_code_size+1 … 12 bits), CLEAR and
  EOI codes, 255-byte sub-block framing, little-endian bit packing;
- GIF89a ANIMATION, both directions: `encode_animation` writes one
  graphic-control extension (disposal / delay / transparency) per
  frame plus the NETSCAPE2.0 looping application extension;
  `decode_frames` composites every image descriptor onto the logical
  canvas per the spec's disposal semantics (1 = leave, 2 = restore
  background, 3 = restore previous) honoring sub-rectangle frames and
  transparent-index pixels — the common web-GIF cases. `decode` keeps
  its first-frame contract for single-image feature extraction.

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


# --------------------------------------------------------------------------
# GIF89a animation: multiple image descriptors + graphic-control
# extensions (+ NETSCAPE looping). Spec block layout per the public
# GIF89a specification §23 (GCE) and the NETSCAPE2.0 app extension.
# --------------------------------------------------------------------------


def encode_animation(
    frames: "list",
    palette: "np.ndarray | None" = None,
    delays_cs: "list[int] | None" = None,
    loop: int = 0,
    disposal: "int | list[int]" = 1,
) -> bytes:
    """Encode an animated GIF89a. ``frames`` is a list of either
    (h, w) uint8 index arrays (full-canvas frames) or tuples
    ``(pixels, left, top, transparent_idx|None)`` for sub-rectangle
    frames with optional transparency — the forms real web GIFs use.
    One global color table (grey ramp by default); per-frame
    graphic-control extensions carry ``delays_cs`` (centiseconds,
    default 4) and ``disposal`` (int for all frames or a per-frame
    list: 1 = leave in place, 2 = restore background, 3 = restore
    previous); ``loop`` rides the NETSCAPE2.0 application extension
    (0 = forever)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    norm = []
    for fr in frames:
        if isinstance(fr, tuple):
            px, left, top, trans = fr
        else:
            px, left, top, trans = fr, 0, 0, None
        if px.ndim != 2:
            raise ValueError("frames are palette-indexed (h, w) arrays")
        norm.append((px, int(left), int(top), trans))
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    n = len(palette)
    depth = max(1, int(np.ceil(np.log2(max(n, 2)))))
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[:n] = palette
    sw = max(px.shape[1] + left for px, left, _t, _x in norm)
    sh = max(px.shape[0] + top for px, _l, top, _x in norm)
    out = bytearray()
    out += b"GIF89a" + struct.pack(
        "<HHBBB", sw, sh, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    out += gct.tobytes()
    out += (
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        + struct.pack("<H", loop)
        + b"\x00"
    )
    min_code = max(2, depth)
    for i, (px, left, top, trans) in enumerate(norm):
        delay = 4 if delays_cs is None else int(delays_cs[i])
        disp = disposal[i] if isinstance(disposal, (list, tuple)) else disposal
        packed = (disp & 0x7) << 2 | (1 if trans is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", packed, delay, trans if trans is not None else 0
        ) + b"\x00"
        h, w = px.shape
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        out += bytes([min_code])
        out += _sub_blocks(lzw_encode(px.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


def decode_frames(payload: bytes) -> "list[tuple[np.ndarray, int]]":
    """Decode EVERY frame of a (possibly animated) GIF, composited onto
    the logical canvas per disposal semantics. Returns a frame table:
    ``[(full-canvas (h, w, 3) uint8 RGB, delay_cs), ...]`` — the GIF
    analogue of `mp4.extract_samples`. Sub-rectangle frames paint only
    their region; transparent-index pixels leave the canvas unchanged;
    disposal 2 restores the painted region to the background color and
    3 restores the pre-frame canvas."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[tuple[np.ndarray, int]] = []
    delay, disposal, trans = 0, 0, None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:
            label = payload[pos + 1]
            pos += 2
            blocks = bytearray()
            while payload[pos]:
                ln = payload[pos]
                blocks.extend(payload[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and len(blocks) >= 4:
                packed, delay = struct.unpack_from("<BH", bytes(blocks), 0)
                disposal = (packed >> 2) & 0x7
                trans = blocks[3] if packed & 0x1 else None
        elif b == 0x2C:
            _, left, top, w, h, iflags = struct.unpack_from(
                "<BHHHHB", payload, pos
            )
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
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top: top + h, left: left + w]
            if trans is not None:
                mask = idx != trans
                region[mask] = table[idx[mask]]
            else:
                region[...] = table[idx]
            frames.append((canvas.copy(), delay))
            if disposal == 2:
                canvas[top: top + h, left: left + w] = bg_rgb
            elif disposal == 3:
                canvas = before
            delay, disposal, trans = 0, 0, None
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
    if not frames:
        raise ValueError("GIF has no image data")
    return frames
