"""WAV audio codec in pure numpy + stdlib — no external libraries.

Closes the "non-PCM WAV" gate in `operators/multimodal.py`: a RIFF
parser + sample decoders for every common WAVE format tag, all from
the public container/G.711/IMA specs:

- PCM (format 1): 8-bit unsigned, 16/24/32-bit signed little-endian
- IEEE float (format 3): float32 / float64
- G.711 A-law (format 6) and µ-law (format 7): the telephony
  companding codecs, decoded via their exact piecewise-linear expansion
- IMA/DVI ADPCM (format 17): block-structured 4-bit adaptive delta
  coding — per-block predictor/step-index header, nibble stream, the
  standard 89-entry step table
- WAVE_FORMAT_EXTENSIBLE (0xFFFE) unwraps to its SubFormat GUID

`decode_wav` returns (n_channels, sample_rate, float32 samples in
[-1, 1], channel-interleaved) for every tag; `encode_wav` writes the
same tags so round trips (and the multimodal pipeline's fixtures) need
no external audio tooling. Stereo ADPCM interleaves per 4-byte word
per the container spec.

Decoding is vectorized per format (G.711 decodes via a 256-entry
lookup built from the expansion formula; ADPCM is the one genuinely
sample-sequential codec — its inner loop is per block, and blocks are
independent, so at corpus scale it parallelizes per document through
Arrow-batched `mapInPandas` like the image codecs).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# G.711 companding (public spec; the classic reference expansion)
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_decode_table() -> np.ndarray:
    out = np.zeros(256, dtype=np.int16)
    for u in range(256):
        v = ~u & 0xFF
        sign = v & 0x80
        exponent = (v >> 4) & 0x07
        mantissa = v & 0x0F
        sample = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
        out[u] = -sample if sign else sample
    return out


def _alaw_decode_table() -> np.ndarray:
    # CCITT G.711 alaw2linear: values already on the 16-bit scale
    # (max 32256); sign bit SET means POSITIVE after the 0x55 toggle
    out = np.zeros(256, dtype=np.int16)
    for a in range(256):
        v = a ^ 0x55
        sign = v & 0x80
        seg = (v >> 4) & 0x07
        t = (v & 0x0F) << 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[a] = t if sign else -t
    return out


_ULAW_TABLE = _ulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → µ-law bytes (vectorized; exact inverse of the decode
    table in the sense that decode(encode(x)) is the nearest companded
    level)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exponent = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → A-law bytes (vectorized CCITT linear2alaw: 13-bit
    domain, segment search, 0x55 toggle; sign bit set for positive)."""
    x = samples.astype(np.int32) >> 3  # 13-bit domain (arithmetic)
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag)  # first seg_end >= mag
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((mag >> shift) & 0x0F)
    aval = np.where(seg >= 8, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (format 17) — public step/index tables
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

_IMA_INDEX_ADJUST = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int, idx: int) -> np.ndarray:
    """Sequential IMA expansion of one channel's nibble stream from a
    block header's (predictor, step index)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    p, i = pred, idx
    for k, nib in enumerate(nibbles):
        step = int(_IMA_STEPS[i])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        p = p - diff if nib & 8 else p + diff
        p = max(-32768, min(32767, p))
        i = max(0, min(88, i + int(_IMA_INDEX_ADJUST[nib])))
        out[k] = p
    return out


def _ima_encode_channel(samples: np.ndarray, block_samples: int) -> bytes:
    """One mono channel → IMA ADPCM block stream (header + nibbles per
    block; the standard greedy quantizer)."""
    out = bytearray()
    pos = 0
    idx = 0
    n = len(samples)
    while pos < n:
        chunk = samples[pos: pos + block_samples]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEPS[idx])
            delta = int(s) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX_ADJUST[nib])))
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        pairs = np.array(nibbles, dtype=np.uint8).reshape(-1, 2)
        out += (pairs[:, 0] | (pairs[:, 1] << 4)).tobytes()
        pos += block_samples
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

#: WAVE_FORMAT_EXTENSIBLE SubFormat GUID suffix (the first 2 bytes are
#: the wrapped format tag)
_EXT_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")

_PCM, _FLOAT, _ALAW, _ULAW, _IMA, _EXTENSIBLE = 1, 3, 6, 7, 0x11, 0xFFFE


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a WAV of any supported format tag: (n_channels,
    sample_rate, float32 samples in [-1, 1], interleaved). Raises
    ValueError for non-RIFF input and NotImplementedError for format
    tags outside {PCM, float, A-law, µ-law, IMA ADPCM}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    fact = None
    while pos + 8 <= len(payload):
        tag, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact" and len(body) >= 4:
            fact = struct.unpack_from("<I", body, 0)[0]
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format == _EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        guid = fmt[24:40]
        if guid[2:] != _EXT_GUID_TAIL:
            raise NotImplementedError(f"unknown SubFormat GUID {guid.hex()}")
        audio_format = struct.unpack_from("<H", guid, 0)[0]

    if audio_format == _PCM:
        if bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            samples = (
                np.frombuffer(data, dtype="<i4").astype(np.float32)
                / float(1 << 31)
            )
        else:
            raise NotImplementedError(f"{bits}-bit PCM")
    elif audio_format == _FLOAT:
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"{bits}-bit IEEE float WAV")
    elif audio_format == _ULAW:
        samples = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(
            np.float32
        ) / 32768.0
    elif audio_format == _ALAW:
        samples = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(
            np.float32
        ) / 32768.0
    elif audio_format == _IMA:
        pcm = _decode_ima(data, n_ch, block_align)
        if fact is not None:  # true frame count (last block may be short)
            pcm = pcm[: fact * n_ch]
        samples = pcm.astype(np.float32) / 32768.0
    else:
        raise NotImplementedError(f"WAV format tag {audio_format:#x}")
    return n_ch, rate, samples


def _decode_ima(data: bytes, n_ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk → interleaved int16 samples. Mono blocks
    are header + packed nibbles; stereo interleaves one 4-byte word
    (8 nibbles) per channel."""
    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    for off in range(0, len(data), block_align):
        block = data[off: off + block_align]  # final block may be short
        if len(block) < 4 * n_ch:
            break
        heads = []
        for ch in range(n_ch):
            pred, idx, _rsv = struct.unpack_from("<hBB", block, 4 * ch)
            heads.append((pred, idx))
            chans[ch].append(np.array([pred], dtype=np.int16))
        body = np.frombuffer(block[4 * n_ch:], dtype=np.uint8)
        nibbles = np.empty(len(body) * 2, dtype=np.uint8)
        nibbles[0::2] = body & 0x0F
        nibbles[1::2] = body >> 4
        if n_ch == 1:
            chans[0].append(
                _ima_decode_nibbles(nibbles, heads[0][0], heads[0][1])
            )
        else:
            # per-channel runs of 8 nibbles (one LE word each)
            whole = (len(nibbles) // (8 * n_ch)) * 8 * n_ch
            words = nibbles[:whole].reshape(-1, 8)
            for ch in range(n_ch):
                ch_nib = words[ch::n_ch].reshape(-1)
                chans[ch].append(
                    _ima_decode_nibbles(ch_nib, heads[ch][0], heads[ch][1])
                )
    per_ch = [np.concatenate(c) for c in chans]
    n = min(len(c) for c in per_ch)
    return np.stack([c[:n] for c in per_ch], axis=1).reshape(-1)


def encode_wav(
    samples: np.ndarray,
    rate: int = 16000,
    n_ch: int = 1,
    fmt: str = "pcm16",
) -> bytes:
    """Encode float samples in [-1, 1] (interleaved if n_ch > 1) as a
    WAV with the requested format tag: pcm8 / pcm16 / pcm24 / pcm32 /
    float32 / float64 / ulaw / alaw / ima_adpcm (mono only) /
    pcm16x (PCM16 wrapped in WAVE_FORMAT_EXTENSIBLE)."""
    x = np.asarray(samples, dtype=np.float64).clip(-1.0, 1.0)
    i16 = np.round(x * 32767.0).astype(np.int16)
    ext = False
    if fmt == "pcm8":
        tag, bits, data = _PCM, 8, ((i16.astype(np.int32) // 256) + 128).astype(np.uint8).tobytes()
    elif fmt in ("pcm16", "pcm16x"):
        tag, bits, data = _PCM, 16, i16.astype("<i2").tobytes()
        ext = fmt == "pcm16x"
    elif fmt == "pcm24":
        v = np.round(x * float((1 << 23) - 1)).astype(np.int32)
        u = np.where(v < 0, v + (1 << 24), v)
        b = np.empty((len(u), 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        tag, bits, data = _PCM, 24, b.tobytes()
    elif fmt == "pcm32":
        v = np.round(x * float((1 << 31) - 1)).astype("<i4")
        tag, bits, data = _PCM, 32, v.tobytes()
    elif fmt == "float32":
        tag, bits, data = _FLOAT, 32, x.astype("<f4").tobytes()
    elif fmt == "float64":
        tag, bits, data = _FLOAT, 64, x.astype("<f8").tobytes()
    elif fmt == "ulaw":
        tag, bits, data = _ULAW, 8, ulaw_encode(i16).tobytes()
    elif fmt == "alaw":
        tag, bits, data = _ALAW, 8, alaw_encode(i16).tobytes()
    elif fmt == "ima_adpcm":
        if n_ch != 1:
            raise NotImplementedError("ADPCM encoder is mono-only")
        block_samples = 505  # → block_align 256 = 4 + 252 nibble bytes
        tag, bits = _IMA, 4
        data = _ima_encode_channel(i16, block_samples)
    else:
        raise ValueError(f"unknown format {fmt!r}")

    if tag == _IMA:
        block_align = 256
        byte_rate = rate * block_align // 505
        fmt_body = struct.pack(
            "<HHIIHHH", _IMA, n_ch, rate, byte_rate, block_align, bits, 2
        ) + struct.pack("<H", 505)
    elif ext:
        block_align = n_ch * bits // 8
        guid = struct.pack("<H", _PCM) + _EXT_GUID_TAIL
        fmt_body = struct.pack(
            "<HHIIHHHHI", _EXTENSIBLE, n_ch, rate, rate * block_align,
            block_align, bits, 22, bits, 0x4 if n_ch == 1 else 0x3,
        ) + guid
    else:
        block_align = max(1, n_ch * bits // 8)
        fmt_body = struct.pack(
            "<HHIIHH", tag, n_ch, rate, rate * block_align, block_align, bits
        )
    chunks = b"WAVE"
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) % 2:
        chunks += b"\x00"
    if tag == _IMA:  # true frame count — the last block may be short
        chunks += b"fact" + struct.pack("<II", 4, len(i16) // n_ch)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
