"""Multimodal column plumbing (north-star): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

Decoding is two-tier and honest about which is which:

- **Real decoders** for formats stdlib + numpy can parse — WAV (RIFF
  PCM via `wave`), 24-bit BMP, binary PPM, baseline sequential JPEG
  (`operators/jpeg.py`, a from-scratch T.81 implementation), and PNG
  (`operators/png.py`, stdlib zlib + spec filters) — with matching
  encoders, so round-trips and the Spark pipelines are tested on
  genuine media bytes (`decode_wav`/`decode_bmp`/`decode_ppm`/
  `jpeg.decode`/`png.decode`, dispatched by magic bytes in
  `decode_real`; real features + real resize in
  `extract_real_media_features` / `resize_image_real`).
- **`decode_stub`** (deterministic fake) for video/audio codec formats
  (MP4/Opus — genuinely need ffmpeg-class libraries for FRAME decode)
  — `decode_real` raises on those, but `extract_media_metadata` still
  reads MP4 CONTAINER metadata (dims/duration/tracks) via the pure
  struct ISO-BMFF parser in `operators/mp4.py`.

Scale: payloads travel as Arrow binary buffers; ``mapInPandas`` processes
one partition's batches streaming-style, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, not by
partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature-extraction stage.
MEDIA_FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, feature array<float>"
)


def attach_fake_payload(
    df: DataFrame, id_col: str, seed_col: str, media_type: str = "image"
) -> DataFrame:
    """Manufacture a deterministic binary payload column from a string
    column (the testdata has no real media; the plumbing is the point)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(seed_col), "utf-8").alias("payload"),
    )


# --------------------------------------------------------------------------
# REAL decoders for the formats decodable with stdlib + numpy alone:
# WAV (RIFF PCM via the `wave` module), BMP (24-bit uncompressed,
# struct-parsed), PPM (P6 binary), JPEG (`operators/jpeg.py`), PNG
# (`operators/png.py`). Video/audio codec formats (MP4/Opus) genuinely
# need ffmpeg-class libraries and still raise — the dispatcher sniffs
# magic bytes and is honest about which is which.
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono float32 samples in [-1, 1] as a real 16-bit PCM WAV."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a WAV of any supported format tag — PCM 8/16/24/32,
    IEEE float, G.711 µ-law/A-law, IMA ADPCM, and the EXTENSIBLE
    wrapper — via the full RIFF codec in `operators/audio.py`:
    (n_channels, sample_rate, float32 samples in [-1, 1],
    interleaved)."""
    from march_mania_spark_lakehouse_spark.operators import audio

    return audio.decode_wav(payload)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real 24-bit uncompressed
    BMP (bottom-up rows, 4-byte row padding, BITMAPINFOHEADER)."""
    import struct

    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # BGR on disk
        img += row + b"\x00" * (row_bytes - len(row))
    header_size = 14 + 40
    file_size = header_size + len(img)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
        + bytes(img)
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr, w, h, _planes, bpp, compression) = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got {bpp}bpp)")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        off = data_offset + i * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off)
        y = (h - 1 - i) if bottom_up else i
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) to an (h, w, 3) uint8 RGB array."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts: list[bytes] = []
    i = 2
    while len(parts) < 3:  # width, height, maxval — comments allowed
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h = int(parts[0]), int(parts[1])
    return (
        np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def _profile8(values: np.ndarray, post=None) -> np.ndarray:
    """8-segment mean profile with empty-segment safety: when the input
    has fewer than 8 elements a segment degenerates to its nearest
    sample instead of producing a NaN that Arrow would null out."""
    n = len(values)
    if n == 0:
        return np.zeros(8, dtype=np.float32)
    bounds = [round(i * n / 8) for i in range(9)]
    out = []
    for i in range(8):
        lo, hi = bounds[i], bounds[i + 1]
        seg = values[lo:hi] if hi > lo else values[min(lo, n - 1) : min(lo, n - 1) + 1]
        m = float(np.mean(seg))
        out.append(float(post(m)) if post is not None else m)
    return np.array(out, dtype=np.float32)


def spectral_peak_bin(samples: np.ndarray, n_fft: int | None = None) -> int:
    """Dominant non-DC frequency bin of a mono signal via numpy rfft —
    real audio DSP (no external DSP library needed). For a sine placed
    exactly on a bin center the argmax is deterministic, which is what
    lets q176 value-oracle an FFT pipeline."""
    n = len(samples) if n_fft is None else n_fft
    mag = np.abs(np.fft.rfft(samples[:n], n=n))
    mag[0] = 0.0  # ignore DC
    return int(np.argmax(mag))


def band_energies(samples: np.ndarray, n_bands: int = 8) -> np.ndarray:
    """Log-energy in ``n_bands`` equal-width frequency bands — the
    classic cheap audio feature (a linear-frequency filterbank; swap in
    mel spacing on a cluster with real speech data)."""
    mag = np.abs(np.fft.rfft(samples.astype(np.float64))) ** 2
    n = len(mag)
    bounds = [round(i * n / n_bands) for i in range(n_bands + 1)]
    out = []
    for i in range(n_bands):
        lo, hi = bounds[i], max(bounds[i + 1], bounds[i] + 1)
        out.append(float(np.log10(mag[lo:hi].mean() + 1e-12)))
    return np.array(out, dtype=np.float32)


def decode_real(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Dispatch on magic bytes and REALLY decode the container-decodable
    formats: returns (format, width, height, feature[8] float32).

    - WAV  → width = n_frames, height = n_channels, feature = 8-segment
      RMS envelope of the samples
    - BMP / PPM / JPEG / PNG → real pixel dims, feature = 8-segment
      row-mean intensity profile (JPEG/PNG via the from-scratch codecs
      in `operators/jpeg.py` / `operators/png.py`)
    - MP4 with an MJPEG video track → real frame decode (sample tables
      walked by `operators/mp4.py`, each sample is an independent JPEG):
      width/height from the first decoded frame, feature = 8-segment
      profile over the per-frame mean-luma sequence
    - anything else (H.264 MP4 / Opus… — inter-frame and audio codecs
      genuinely need ffmpeg-class libraries) raises NotImplementedError.
    """
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        n_ch, _rate, samples = decode_wav(payload)
        feat = _profile8(samples.astype(np.float64) ** 2, post=np.sqrt)
        return "wav", len(samples) // max(n_ch, 1), n_ch, feat
    px = fmt = None
    if payload[:2] == b"BM":
        fmt, px = "bmp", decode_bmp(payload)
    elif payload[:2] == b"P6":
        fmt, px = "ppm", decode_ppm(payload)
    elif payload[:2] == b"\xff\xd8":
        from march_mania_spark_lakehouse_spark.operators import jpeg

        fmt, px = "jpeg", jpeg.decode(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        from march_mania_spark_lakehouse_spark.operators import png

        fmt, px = "png", png.decode(payload)
    elif payload[:4] == b"GIF8":
        from march_mania_spark_lakehouse_spark.operators import gif

        fmt, px = "gif", gif.decode(payload)
    if px is not None:
        # 16-bit PNGs decode to uint16 — normalize by the dtype's range
        denom = 65535.0 if px.dtype == np.uint16 else 255.0
        if px.ndim == 2:  # greyscale: profile over rows directly
            h, w = px.shape
            return fmt, w, h, _profile8(px.mean(axis=1) / denom)
        h, w, _ = px.shape
        feat = _profile8(px.reshape(h, -1).mean(axis=1) / denom)
        return fmt, w, h, feat
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        from march_mania_spark_lakehouse_spark.operators import jpeg, mp4

        try:
            samples = mp4.extract_samples(payload)
            frames = [jpeg.decode(s) for s in samples]
        except (NotImplementedError, ValueError) as e:
            raise NotImplementedError(
                f"MP4 without a decodable MJPEG track ({e}); inter-frame "
                "codecs (H.264...) need external decoders"
            ) from None
        h, w, _ = frames[0].shape
        luma = np.array(
            [f.astype(np.float64).mean() / 255.0 for f in frames]
        )
        return "mp4-mjpeg", w, h, _profile8(luma)
    raise NotImplementedError(
        "audio codecs (Opus) and non-ISO-BMFF video need external "
        "libraries; container-decodable formats are WAV/BMP/PPM/JPEG/"
        "PNG/MJPEG-MP4"
    )


def decode_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decode: derives a (width, height, 8-dim feature)
    from the payload bytes alone, so tests are reproducible anywhere."""
    n = len(payload)
    width = 16 + n % 16
    height = 16 + (n // 16) % 16
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    feat = np.resize(arr, 8) / 255.0
    return width, height, feat


def extract_media_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow-batched).

    Input contract: (media_id long, media_type string, payload binary).
    Each batch is processed columnar-wise; the decode call is the only
    per-item Python work.
    """

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                w, h, f = decode_stub(raw)
                ws.append(w)
                hs.append(h)
                feats.append(f.tolist())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "width": ws,
                    "height": hs,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_process, schema=MEDIA_FEATURE_SCHEMA)


REAL_FEATURE_SCHEMA = (
    "media_id long, format string, n_bytes long, "
    "width int, height int, feature array<float>"
)


def extract_real_media_features(df: DataFrame) -> DataFrame:
    """Feature extraction with REAL decoding (`decode_real`): WAV/BMP/PPM
    payloads are parsed for actual dimensions/samples, features are
    computed from real pixel/sample values. Same Arrow-batched
    ``mapInPandas`` shape as the stub pipeline — swap-in proof that the
    plumbing carries a genuine decoder. Input: (media_id, payload)."""

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, feats, sizes = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                fmt, w, h, feat = decode_real(raw)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                feats.append(feat.tolist())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "n_bytes": sizes,
                    "width": ws,
                    "height": hs,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_process, schema=REAL_FEATURE_SCHEMA)


def resize_image_real(
    df: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """REAL image resize: decode BMP/PPM/JPEG/PNG pixels, nearest-neighbor
    resample to (target_w × target_h), re-encode as BMP. Output payloads
    are valid BMP files with the target dimensions — verifiable by
    decoding them again. Input: (media_id, payload)."""

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if raw[:2] == b"BM":
                    px = decode_bmp(raw)
                elif raw[:2] == b"\xff\xd8":
                    from march_mania_spark_lakehouse_spark.operators import jpeg

                    px = jpeg.decode(raw)
                elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                    from march_mania_spark_lakehouse_spark.operators import png

                    px = png.decode(raw)
                else:
                    px = decode_ppm(raw)
                if px.ndim == 2:
                    px = np.stack([px] * 3, axis=-1)
                elif px.shape[2] == 4:  # drop alpha for the BMP re-encode
                    px = px[..., :3]
                h, w, _ = px.shape
                ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                out.append(encode_bmp(px[np.ix_(ys, xs)]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return df.mapInPandas(
        _process, schema="media_id long, width int, height int, payload binary"
    )


RESIZED_SCHEMA = (
    "media_id long, media_type string, width int, height int, payload binary"
)


def resize_media(
    df: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """Resize stage over ``mapInPandas``: contract (media_id, media_type,
    payload) → fixed (target_w × target_h) payloads.

    The pixel resample itself is stubbed deterministically (byte-level
    nearest-neighbor over the payload — no codec in this container); the
    Spark plumbing is the real thing: Arrow batches in, binary column
    out, executor memory bounded per batch, schema declared up front.
    """

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                # nearest-neighbor byte resample to the target size
                idx = (np.arange(n_out) * max(len(raw), 1) // n_out) % max(len(raw), 1)
                out.append(raw[idx].tobytes() if len(raw) else b"\x00" * n_out)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return df.mapInPandas(_process, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame sampling for video-like payloads: treat the payload as a
    sequence of fixed-size frames, keep every ``every_n``-th.

    Emits one row per sampled frame — a row-multiplying ``mapInPandas``
    (the output iterator is not 1:1 with input batches), which is the
    shape a real video pipeline needs: frames of one clip stay in one
    partition, downstream ops repartition as usual.
    """

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = len(raw) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(media_id)
                    idxs.append(fi)
                    frames.append(raw[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.mapInPandas(_process, schema=FRAME_SCHEMA)


MEDIA_METADATA_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "duration_ms long, n_tracks int"
)


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """Container-level metadata WITHOUT content decode — the filter
    input a curation pipeline needs before spending any codec time:
    images (BMP/PPM/JPEG/PNG) → pixel dims; WAV → duration from the
    frame count and rate; MP4 → dims/duration/track count from the
    ISO-BMFF box tree (`operators/mp4.py` — pure struct, no ffmpeg).
    Input: (media_id, payload); duration is 0 for stills, n_tracks 1
    for single-stream formats."""

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from march_mania_spark_lakehouse_spark.operators import jpeg, mp4, png

        for pdf in batches:
            fmts, ws, hs, durs, trs = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    n_ch, rate, samples = decode_wav(raw)
                    n_frames = len(samples) // max(n_ch, 1)
                    fmt, w, h = "wav", n_frames, n_ch
                    dur, tracks = n_frames * 1000 // max(rate, 1), 1
                elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                    px = png.decode(raw)
                    fmt, h, w = "png", px.shape[0], px.shape[1]
                    dur, tracks = 0, 1
                elif raw[:2] == b"\xff\xd8":
                    px = jpeg.decode(raw)
                    fmt, h, w = "jpeg", px.shape[0], px.shape[1]
                    dur, tracks = 0, 1
                elif raw[:2] == b"BM":
                    px = decode_bmp(raw)
                    fmt, h, w = "bmp", px.shape[0], px.shape[1]
                    dur, tracks = 0, 1
                elif raw[:2] == b"P6":
                    px = decode_ppm(raw)
                    fmt, h, w = "ppm", px.shape[0], px.shape[1]
                    dur, tracks = 0, 1
                else:
                    info = mp4.probe(raw)  # raises on unknown formats
                    fmt = "mp4"
                    w, h = info["width"], info["height"]
                    dur, tracks = info["duration_ms"], info["n_tracks"]
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                durs.append(dur)
                trs.append(tracks)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "width": ws,
                    "height": hs,
                    "duration_ms": durs,
                    "n_tracks": trs,
                }
            )

    return df.mapInPandas(_process, schema=MEDIA_METADATA_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual image hashing (pHash) + hamming-banded near-dup pairs:
# image-side dedup for a multimodal training corpus, the visual twin
# of the MinHash/SimHash ladder in operators/dedup.py. The hash is the
# classic DCT pHash (public algorithm): grayscale → 32×32 resample →
# 2-D DCT-II → 8×8 low-frequency block → bit per coefficient vs the
# block median. Near-dups are found by the pigeonhole banding trick:
# split the 64 bits into (max_distance+1) bands — two hashes within
# hamming distance d MUST agree exactly on at least one band, so
# candidates come from a (band, value) equi-join (Σ bucket², never
# all-pairs) and the exact bit_count verify runs only on candidates.
# --------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (from the textbook formula)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    c[0] /= np.sqrt(2.0)
    return c


_DCT32 = _dct_matrix(32)


def phash64(px: np.ndarray) -> int:
    """64-bit pHash of an (H, W) or (H, W, C) uint8 image."""
    g = px.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small = g[np.ix_(ys, xs)]
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].ravel()
    med = np.median(block)
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # keep the sign bit clear so the hash rides in a Spark LongType
    return out & ((1 << 63) - 1)


def image_phash(df: DataFrame) -> DataFrame:
    """(media_id, payload) → (media_id, phash long). Arrow-batched
    map-only stage: at 100 TB hashes stream out of the image scan; the
    64-bit hash is the only thing that ever shuffles."""

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if raw[:2] == b"BM":
                    px = decode_bmp(raw)
                elif raw[:2] == b"\xff\xd8":
                    from march_mania_spark_lakehouse_spark.operators import jpeg

                    px = jpeg.decode(raw)
                elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                    from march_mania_spark_lakehouse_spark.operators import png

                    px = png.decode(raw)
                else:
                    px = decode_ppm(raw)
                hashes.append(phash64(px))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            ).astype({"phash": "int64"})

    return df.mapInPandas(_process, schema="media_id long, phash long")


def phash_near_dup_pairs(
    hashes: DataFrame, max_distance: int = 6
) -> DataFrame:
    """(media_id, phash) → near-dup pairs (id_a < id_b, distance ≤
    max_distance). Pigeonhole banding: (max_distance+1) bands over the
    63 stored bits guarantee every qualifying pair collides on ≥1 band;
    the band join is the only exchange and the hamming verify is pure
    codegen (xor + bit_count). Deduped across bands via distinct."""
    from pyspark.sql import functions as F

    n_bands = max_distance + 1
    if n_bands > 63:
        raise ValueError(
            f"max_distance={max_distance} needs {n_bands} bands over 63 "
            "stored bits — the pigeonhole guarantee cannot hold"
        )
    # balanced partition of the 63 bits into EXACTLY n_bands non-empty
    # contiguous bands (sizes ⌊63/n⌋ or ⌈63/n⌉): band b = bits
    # [63·b/n, 63·(b+1)/n). A fixed uniform width under-produces bands
    # for several n (e.g. 9 bands of 8 bits overrun bit 63 and the 9th
    # vanished), silently voiding the pigeonhole recall guarantee.
    bands = []
    for b in range(n_bands):
        lo = 63 * b // n_bands
        w = 63 * (b + 1) // n_bands - lo
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("phash"), lo).bitwiseAND(
                    F.lit((1 << w) - 1)
                ).alias("val"),
            )
        )
    tagged = hashes.select(
        "media_id", "phash", F.explode(F.array(*bands)).alias("bv")
    ).select("media_id", "phash", "bv.band", "bv.val")
    a, b = tagged.alias("a"), tagged.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.val") == F.col("b.val"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )
    assert len(bands) == n_bands  # pigeonhole needs every band present
    return pairs
