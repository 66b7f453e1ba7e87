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
