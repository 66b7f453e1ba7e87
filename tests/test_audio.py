"""Tests for the pure-numpy WAV codec (`operators/audio.py`): every
format tag round-trips through encode_wav/decode_wav with a MEASURED
SNR bound (set ~5 dB under observed, per the codec-testing lesson:
"sounds reasonable" floors pass on broken codecs), G.711 is checked
for per-byte idempotence against its own decode tables, and the
stereo ADPCM word-interleave is pinned with a hand-built fixture that
shares no code with the encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from march_mania_spark_lakehouse_spark.operators import audio


def _sig(n: int = 8000) -> np.ndarray:
    t = np.linspace(0, 1, n, endpoint=False)
    return 0.6 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1130 * t)


def _snr(ref: np.ndarray, out: np.ndarray) -> float:
    n = min(len(ref), len(out))
    e = ref[:n] - out[:n]
    return 10 * np.log10(np.sum(ref[:n] ** 2) / max(np.sum(e ** 2), 1e-12))


# measured SNRs on the 2-tone signal: pcm8 40.4, ulaw 37.8, alaw 38.1,
# ima 24.3; exact formats bottom out at float32 precision (~152 dB)
@pytest.mark.parametrize("fmt,min_snr", [
    ("pcm8", 35.0), ("pcm16", 80.0), ("pcm24", 120.0), ("pcm32", 140.0),
    ("float32", 140.0), ("float64", 140.0),
    ("ulaw", 32.0), ("alaw", 33.0), ("ima_adpcm", 19.0), ("pcm16x", 80.0),
])
def test_roundtrip_snr(fmt, min_snr):
    sig = _sig()
    n_ch, rate, out = audio.decode_wav(audio.encode_wav(sig, 8000, 1, fmt))
    assert (n_ch, rate) == (1, 8000)
    assert len(out) == len(sig)  # fact chunk trims ADPCM's short block
    assert _snr(sig, out) >= min_snr, fmt


def test_stereo_pcm16_interleaved():
    sig = _sig(4000)
    st = np.empty(8000)
    st[0::2], st[1::2] = sig, -sig
    n_ch, rate, out = audio.decode_wav(audio.encode_wav(st, 8000, 2, "pcm16"))
    assert n_ch == 2 and len(out) == 8000
    assert _snr(st, out) >= 80.0


def test_g711_decode_encode_idempotent_per_byte():
    """encode(decode(b)) == b for every code word — A-law exactly;
    µ-law for 255/256 (0x7F and 0xFF both decode to zero per spec, so
    one of the pair can't survive the round trip)."""
    ok_a = sum(
        int(audio.alaw_encode(np.array([audio._ALAW_TABLE[b]], dtype=np.int16))[0]) == b
        for b in range(256)
    )
    ok_u = sum(
        int(audio.ulaw_encode(np.array([audio._ULAW_TABLE[b]], dtype=np.int16))[0]) == b
        for b in range(256)
    )
    assert ok_a == 256
    assert ok_u >= 255


def test_stereo_ima_adpcm_word_interleave():
    """Hand-built stereo ADPCM block (per-channel headers, 4-byte-word
    nibble interleave) decodes both channels; the nibble stream is
    produced by an in-test re-implementation of the IMA quantizer, so
    this pins the DECODER independently of the module's encoder."""
    sig = _sig(505)
    l16 = np.round(sig * 32767).astype(np.int16)
    r16 = np.round(-sig * 32767).astype(np.int16)

    def nibble_stream(samples):
        pred, idx, nibs = int(samples[0]), 0, []
        for s in samples[1:]:
            step = int(audio._IMA_STEPS[idx])
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
            pred = max(-32768, min(32767, pred - diff if nib & 8 else pred + diff))
            idx = max(0, min(88, idx + int(audio._IMA_INDEX_ADJUST[nib])))
            nibs.append(nib)
        return int(samples[0]), nibs

    pl, nl = nibble_stream(l16)
    pr, nr = nibble_stream(r16)
    block = struct.pack("<hBB", pl, 0, 0) + struct.pack("<hBB", pr, 0, 0)
    body = bytearray()
    for w in range(63):  # 504 nibbles per channel → 63 words of 8
        for nibs in (nl, nr):
            chunk = nibs[w * 8: (w + 1) * 8]
            for i in range(0, 8, 2):
                body.append(chunk[i] | (chunk[i + 1] << 4))
    block += bytes(body)
    fmt_body = struct.pack(
        "<HHIIHHH", 0x11, 2, 8000, 8000 * len(block) // 505, len(block), 4, 2
    ) + struct.pack("<H", 505)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(block)) + bytes(block)
    )
    wav = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    n_ch, rate, out = audio.decode_wav(wav)
    assert (n_ch, rate) == (2, 8000)
    ref = np.empty(1010)
    ref[0::2], ref[1::2] = sig, -sig
    assert _snr(ref, out) >= 13.0  # measured 17.8


def test_extensible_wrapper_unwraps_to_pcm():
    sig = _sig(1000)
    enc = audio.encode_wav(sig, 8000, 1, "pcm16x")
    # the fmt chunk really is WAVE_FORMAT_EXTENSIBLE on the wire
    assert struct.unpack_from("<H", enc, 20)[0] == 0xFFFE
    _, _, out = audio.decode_wav(enc)
    assert _snr(sig, out) >= 80.0


def test_rejects_unknown_tag_and_non_riff():
    with pytest.raises(ValueError):
        audio.decode_wav(b"OggS not a wav")
    fmt_body = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 8)  # MP3 tag
    chunks = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError):
        audio.decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)


def test_multimodal_decode_wav_delegates():
    from march_mania_spark_lakehouse_spark.operators.multimodal import decode_wav

    sig = _sig(2000)
    n_ch, rate, out = decode_wav(audio.encode_wav(sig, 16000, 1, "ulaw"))
    assert (n_ch, rate) == (1, 16000)
    assert _snr(sig, out) >= 32.0