"""Multimodal column plumbing (north-star): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode step is stubbed
behind ``decode_stub`` (deterministic fake) / ``decode_real``
(NotImplementedError) — but the Spark-side plumbing is real and tested:
schema contracts, batch iteration shape, partition sizing, and the
metadata struct layout all match what a production decode would use.

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


def decode_real(payload: bytes) -> np.ndarray:
    """Real decode — requires an image/audio codec not in this container."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed; use decode_stub"
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
