"""Round-6 media batch: REAL video frame decode (MJPEG-in-MP4) under
an exact SQL oracle.

The q174 trick extended to video: solid-grey frames make a lossy codec
chain value-oracle-able (chroma DC is exactly zero and luma DC
quantization error < 0.5 grey levels, so the JPEG round trip is
bit-exact per frame), and the MP4 sample tables are lossless plumbing
— so mux → demux → decode must reproduce the closed-form frame values
EXACTLY, which the DuckDB oracle recomputes with a lateral range
expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q194 — MJPEG video frame pipeline: per doc, build an MJPEG MP4 (real
# stsd/stts/stsc/stsz/stco sample tables), then demux it, decode every
# SECOND frame with the from-scratch JPEG codec, and surface
# (n_frames, width, height, Σ sampled greys). Every number crosses the
# encode→mux→demux→decode chain, so the oracle's closed-form hash
# check pins all four stages at once.
# --------------------------------------------------------------------------

_Q194_SQL = """
SELECT d.doc_id,
       CAST(3 + d.doc_id % 4 AS INT) AS n_frames,
       CAST(8 + d.doc_id % 16 AS INT) AS width,
       CAST(8 + (d.doc_id * 5) % 16 AS INT) AS height,
       CAST(SUM(CASE WHEN t.f % 2 = 0 THEN (d.doc_id + 17 * t.f) % 256 END)
            AS BIGINT) AS sum_grey
FROM documents d, LATERAL UNNEST(range(0, 3 + d.doc_id % 4)) AS t(f)
GROUP BY d.doc_id
"""


@query("q194_mp4_mjpeg_frames", oracle=_Q194_SQL, tags=("multimodal",))
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampled video statistics over MJPEG MP4s, wholly inside
    Arrow-batched Python workers (`mapInPandas`) — map-only at any
    scale: each video is decoded where it lives, nothing but the
    per-video stat rows cross the wire, and frame STRIDING (every 2nd
    frame here) is the standard way a 100 TB video corpus bounds decode
    cost. Muxing happens in the same worker because the fixtures carry
    no real footage; a production table would store the MP4 bytes in a
    binary column and start at `extract_samples`."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from march_mania_spark_lakehouse_spark.operators import jpeg, mp4
    from march_mania_spark_lakehouse_spark.operators.text import rebalance_scan

    def _pipeline(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            nf, ws, hs, sums = [], [], [], []
            for doc_id in pdf["doc_id"]:
                n = int(3 + doc_id % 4)
                w = int(8 + doc_id % 16)
                h = int(8 + (doc_id * 5) % 16)
                frames = [
                    jpeg.encode(
                        np.full((h, w, 3), int((doc_id + 17 * f) % 256),
                                dtype=np.uint8),
                        quality=85,
                    )
                    for f in range(n)
                ]
                payload = mp4.build_mjpeg_mp4(frames, w, h, fps=10)
                samples = mp4.extract_samples(payload)
                total = 0
                for f in range(0, len(samples), 2):  # frame striding
                    decoded = jpeg.decode(samples[f])
                    if decoded.shape != (h, w, 3):
                        raise ValueError(
                            f"frame {f} of doc {doc_id} decoded to "
                            f"{decoded.shape}, expected {(h, w, 3)}"
                        )
                    total += int(decoded[0, 0, 0])
                nf.append(len(samples))
                ws.append(w)
                hs.append(h)
                sums.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": nf,
                    "width": ws,
                    "height": hs,
                    "sum_grey": sums,
                }
            )

    docs = catalog.load(spark, "documents", sf_dir).select("doc_id")
    return rebalance_scan(docs).mapInPandas(
        _pipeline,
        schema="doc_id long, n_frames int, width int, height int, sum_grey long",
    )
