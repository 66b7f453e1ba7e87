"""ISO-BMFF (MP4) container metadata — pure stdlib struct parsing.

Frame DECODE genuinely needs ffmpeg-class codec libraries and stays
honestly stubbed, but the MP4 *container* is a plain length-prefixed
box tree (ISO/IEC 14496-12, the public spec): brand, duration, track
count, and per-track video dimensions are all readable with struct
alone. That is exactly the metadata a training-data pipeline filters
on (drop clips shorter than N seconds, keep ≥720p, count streams)
without ever touching a codec — so this module upgrades video payloads
from "opaque bytes" to "typed metadata", leaving only pixel access
behind the stub.

Also provides `build_minimal_mp4` — a structurally valid ftyp+moov+mdat
writer used to manufacture deterministic fixtures (the container
equivalent of the synthetic WAV/BMP fixtures; there is no real footage
in the testdata).
"""

from __future__ import annotations

import struct


def parse_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield (box_type, body_start, body_end) for the top-level boxes in
    ``payload[start:end]`` — 32-bit sizes, ``size==1`` largesize and
    ``size==0`` to-end-of-file both per spec."""
    end = len(payload) if end is None else end
    pos = start
    while pos + 8 <= end:
        size, tag = struct.unpack_from(">I4s", payload, pos)
        header = 8
        if size == 1:
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield tag, pos + header, pos + size
        pos += size


def _find(payload: bytes, path: list[bytes], start: int, end: int):
    """Body range of the first box at a nested path, or None."""
    tag, *rest = path
    for t, b, e in parse_boxes(payload, start, end):
        if t == tag:
            if not rest:
                return b, e
            return _find(payload, rest, b, e)
    return None


def probe(payload: bytes) -> dict:
    """Container metadata: {brand, duration_ms, n_tracks, width,
    height} — width/height from the first video track's tkhd (16.16
    fixed point), duration from mvhd (version 0 or 1). Raises
    ValueError if the payload is not ISO-BMFF."""
    boxes = list(parse_boxes(payload))
    if not boxes or boxes[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    brand = payload[boxes[0][1]: boxes[0][1] + 4].decode("ascii", "replace")
    moov = _find(payload, [b"moov"], 0, len(payload))
    if moov is None:
        raise ValueError("no moov box")
    mvhd = _find(payload, [b"mvhd"], *moov)
    if mvhd is None:
        raise ValueError("no mvhd box")
    version = payload[mvhd[0]]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, mvhd[0] + 20)
    else:
        timescale, duration = struct.unpack_from(">II", payload, mvhd[0] + 12)
    n_tracks = 0
    width = height = 0
    for t, b, e in parse_boxes(payload, *moov):
        if t != b"trak":
            continue
        n_tracks += 1
        tkhd = _find(payload, [b"tkhd"], b, e)
        if tkhd is None:
            continue
        tv = payload[tkhd[0]]
        # width/height are the LAST 8 bytes of tkhd (16.16 fixed point):
        # version+flags (4) + v-dependent ids/times (32 for v1, 20 for
        # v0) + reserved/layer/volume (16) + matrix (36)
        off = tkhd[0] + (36 if tv == 1 else 24) + 52
        w_fp, h_fp = struct.unpack_from(">II", payload, off)
        if w_fp and h_fp and width == 0:
            width, height = w_fp >> 16, h_fp >> 16
    return {
        "brand": brand,
        "duration_ms": int(duration * 1000 // max(timescale, 1)),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), tag) + body


def build_minimal_mp4(
    width: int, height: int, duration_ms: int, n_tracks: int = 1,
    payload: bytes = b"",
) -> bytes:
    """A structurally valid (parser-exercising) MP4: ftyp + moov
    (mvhd + one tkhd-bearing trak per track, the first carrying the
    video dimensions) + an mdat holding ``payload``. Fixture-grade: no
    sample tables, so no real player renders it — but every field
    `probe` reads is spec-placed, which is the part under test."""
    timescale = 1000
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xII", 0, 0, 0)           # version, created, modified
        + struct.pack(">II", timescale, duration_ms)
        + struct.pack(">IH2x", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", n_tracks + 1),       # next track id
    )
    traks = []
    for i in range(n_tracks):
        w = width if i == 0 else 0
        h = height if i == 0 else 0
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3xIII4xI8x", 0, 0, 0, i + 1, duration_ms)
            + struct.pack(">HHHH", 0, 0, 0x0100 if i else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        traks.append(_box(b"trak", tkhd))
    return (
        _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
        + _box(b"moov", mvhd + b"".join(traks))
        + _box(b"mdat", payload)
    )
