"""ISO-BMFF (MP4) container parsing and MJPEG frame access — pure
stdlib struct.

The MP4 *container* is a plain length-prefixed box tree (ISO/IEC
14496-12, the public spec): brand, duration, track count, per-track
video dimensions, and the sample tables (stsd/stts/stsc/stsz/stco) are
all readable with struct alone. `probe` surfaces the metadata a
training-data pipeline filters on (drop clips shorter than N seconds,
keep ≥720p, count streams); `extract_samples` walks the sample tables
to raw per-frame bytes; and for MOTION-JPEG tracks — where every
sample is an independent baseline JPEG — the engine's own from-scratch
codec (`operators/jpeg.py`) decodes them to pixels, so MJPEG video
gets REAL frame access with zero external libraries. Inter-frame
codecs (H.264 etc.) remain honestly out of scope: motion-compensated
decode is not something a stdlib implementation can responsibly fake.

Also provides two fixture writers (there is no real footage in the
testdata): `build_minimal_mp4` (metadata-only ftyp+moov+mdat) and
`build_mjpeg_mp4` (full sample tables, demuxable and decodable).
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


# --------------------------------------------------------------------------
# MJPEG: full sample tables + frame extraction. Motion-JPEG stores each
# video sample as an independent baseline JPEG, so the engine's own
# from-scratch JPEG codec (operators/jpeg.py) gives REAL pixel access
# to video — closing the frame-decode gate for this codec family
# without any external library. Inter-frame codecs (H.264 etc.) remain
# honestly out of scope: they need a motion-compensation decoder, which
# no pure-stdlib implementation can responsibly fake.
# --------------------------------------------------------------------------


def build_mjpeg_mp4(
    frames: "list[bytes]", width: int, height: int, fps: int = 10
) -> bytes:
    """Mux independent JPEG samples into a playable-shape MJPEG MP4:
    one video track with REAL sample tables (stsd 'jpeg' visual sample
    entry, stts/stsc/stsz/stco per ISO/IEC 14496-12 §8.5-8.7), samples
    concatenated in one mdat chunk. Two-pass layout: the moov length is
    fixed by the sample COUNT, so the stco chunk offset is computed
    after sizing moov with a placeholder."""
    if not frames:
        raise ValueError("MJPEG needs at least one frame")
    timescale = 1000
    delta = timescale // fps
    duration = delta * len(frames)

    def moov_bytes(chunk_offset: int) -> bytes:
        mvhd = _box(
            b"mvhd",
            struct.pack(">B3xII", 0, 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">IH2x", 0x00010000, 0x0100)
            + b"\x00" * 8
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3xIII4xI8x", 0, 3, 0, 1, duration)
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">B3xII", 0, 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _box(
            b"hdlr",
            struct.pack(">B3xI4s", 0, 0, b"vide") + b"\x00" * 12 + b"video\x00",
        )
        # VisualSampleEntry, format 'jpeg' (ISO 14496-12 §12.1.3)
        sample_entry = _box(
            b"jpeg",
            b"\x00" * 6 + struct.pack(">H", 1)       # reserved, data ref idx
            + b"\x00" * 16                            # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)                    # frame count
            + b"\x05mjpeg" + b"\x00" * 26             # compressor name
            + struct.pack(">Hh", 24, -1),             # depth, color table
        )
        stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + sample_entry)
        stts = _box(
            b"stts",
            struct.pack(">B3xI", 0, 1) + struct.pack(">II", len(frames), delta),
        )
        stsc = _box(
            b"stsc",
            struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, len(frames), 1),
        )
        stsz = _box(
            b"stsz",
            struct.pack(">B3xII", 0, 0, len(frames))
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
        stco = _box(
            b"stco", struct.pack(">B3xI", 0, 1) + struct.pack(">I", chunk_offset)
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _box(b"vmhd", struct.pack(">B3xHHHH", 0, 0, 0, 0, 0))
        dref = _box(
            b"dref",
            struct.pack(">B3xI", 0, 1) + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)),
        )
        dinf = _box(b"dinf", dref)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
    moov_len = len(moov_bytes(0))  # length is offset-independent
    chunk_offset = len(ftyp) + moov_len + 8  # + mdat header
    moov = moov_bytes(chunk_offset)
    assert len(moov) == moov_len
    return ftyp + moov + _box(b"mdat", b"".join(frames))


def extract_samples(payload: bytes) -> "list[bytes]":
    """Walk the first video track's REAL sample tables
    (stsc chunk map + stco chunk offsets + stsz sizes, general N-chunk
    layout per ISO/IEC 14496-12 §8.7.4) and return each sample's raw
    bytes. For an MJPEG track every sample is an independent JPEG;
    `operators.jpeg.decode` turns them into pixels. Raises ValueError
    when the container has no video track with sample tables (e.g. the
    metadata-only fixtures from `build_minimal_mp4`)."""
    moov = _find(payload, [b"moov"], 0, len(payload))
    if moov is None:
        raise ValueError("no moov box")
    for t, b, e in parse_boxes(payload, *moov):
        if t != b"trak":
            continue
        hdlr = _find(payload, [b"mdia", b"hdlr"], b, e)
        if hdlr is None or payload[hdlr[0] + 8: hdlr[0] + 12] != b"vide":
            continue
        stbl = _find(payload, [b"mdia", b"minf", b"stbl"], b, e)
        if stbl is None:
            continue
        stsz = _find(payload, [b"stsz"], *stbl)
        stsc = _find(payload, [b"stsc"], *stbl)
        stco = _find(payload, [b"stco"], *stbl)
        if stsz is None or stsc is None or stco is None:
            continue
        # stsz: default size or per-sample table
        default_size, n_samples = struct.unpack_from(">II", payload, stsz[0] + 4)
        if default_size:
            sizes = [default_size] * n_samples
        else:
            sizes = list(
                struct.unpack_from(f">{n_samples}I", payload, stsz[0] + 12)
            )
        n_chunks = struct.unpack_from(">I", payload, stco[0] + 4)[0]
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco[0] + 8))
        n_stsc = struct.unpack_from(">I", payload, stsc[0] + 4)[0]
        runs = [
            struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)
            for i in range(n_stsc)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_idx)
        # expand the run-length chunk map to per-chunk sample counts
        per_chunk = []
        for i, (first, spc, _desc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        out, si = [], 0
        for ci, chunk_off in enumerate(offsets):
            pos = chunk_off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= n_samples:
                    break
                out.append(payload[pos: pos + sizes[si]])
                pos += sizes[si]
                si += 1
        if si != n_samples:
            raise ValueError(
                f"sample tables inconsistent: walked {si} of {n_samples}"
            )
        return out
    raise ValueError("no video track with sample tables")
