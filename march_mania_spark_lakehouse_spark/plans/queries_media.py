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
from pyspark.sql import functions as F

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


# --------------------------------------------------------------------------
# q201 — REAL GIF decode under an exact SQL oracle: per-doc textured
# grey pattern → palette-indexed GIF89a (from-scratch LZW,
# operators/gif.py) → decode. GIF is lossless, so the round trip is
# bit-exact on TEXTURED content (the q175 PNG contract, now through a
# dictionary coder); the oracle recomputes dims and the pixel-sum
# closed form with two lateral range expansions.
# --------------------------------------------------------------------------

_Q201_SQL = """
SELECT d.doc_id,
       CAST(8 + d.doc_id % 16 AS INT) AS width,
       CAST(8 + (d.doc_id * 3) % 16 AS INT) AS height,
       CAST(2 + d.doc_id % 3 AS INT) AS n_frames,
       CAST(SUM((d.doc_id + 7 * y.y + 13 * x.x + 17 * f.f) % 256) AS BIGINT)
           AS sum_px
FROM documents d,
     LATERAL UNNEST(range(0, 2 + d.doc_id % 3)) AS f(f),
     LATERAL UNNEST(range(0, 8 + (d.doc_id * 3) % 16)) AS y(y),
     LATERAL UNNEST(range(0, 8 + d.doc_id % 16)) AS x(x)
GROUP BY d.doc_id
"""


@query("q201_gif_roundtrip", oracle=_Q201_SQL, tags=("multimodal",))
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode real ANIMATED GIFs in Arrow-batched workers and
    surface (decoded width, height, frame count, all-frame pixel sum)
    against the closed-form oracle. Per doc: 2–4 textured frames →
    `gif.encode_animation` (graphic-control extensions + NETSCAPE
    looping block) → `gif.decode_frames` (full disposal-aware
    compositor); GIF is lossless so every frame must match bit-exactly
    and per-frame delays round-trip too. Map-only at any scale — the
    LZW dictionary and canvas are per-image worker state."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from march_mania_spark_lakehouse_spark.operators import gif
    from march_mania_spark_lakehouse_spark.operators.text import rebalance_scan

    def _roundtrip(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ws, hs, nf, sums = [], [], [], []
            for doc_id in pdf["doc_id"]:
                w = int(8 + doc_id % 16)
                h = int(8 + (doc_id * 3) % 16)
                k = int(2 + doc_id % 3)
                yy, xx = np.mgrid[0:h, 0:w]
                frames = [
                    ((int(doc_id) + 7 * yy + 13 * xx + 17 * f) % 256).astype(
                        np.uint8
                    )
                    for f in range(k)
                ]
                payload = gif.encode_animation(
                    frames, delays_cs=[4 + f for f in range(k)]
                )
                decoded = gif.decode_frames(payload)
                if len(decoded) != k:
                    raise ValueError(f"frame count broke for doc {doc_id}")
                total = 0
                for f, (rgb, delay) in enumerate(decoded):
                    if (
                        rgb.shape != (h, w, 3)
                        or delay != 4 + f
                        or not (rgb[..., 0] == frames[f]).all()
                        or not (rgb[..., 2] == frames[f]).all()
                    ):
                        raise ValueError(
                            f"GIF animation broke for doc {doc_id} frame {f}"
                        )
                    total += int(frames[f].astype(np.int64).sum())
                ws.append(w)
                hs.append(h)
                nf.append(k)
                sums.append(total)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs,
                 "n_frames": nf, "sum_px": sums}
            )

    docs = catalog.load(spark, "documents", sf_dir).select("doc_id")
    return rebalance_scan(docs).mapInPandas(
        _roundtrip,
        schema="doc_id long, width int, height int, n_frames int, sum_px long",
    )


# --------------------------------------------------------------------------
# q209 — perceptual image dedup (pHash + hamming banding): the visual
# member of the dedup ladder. Deterministic per-doc test images
# (frequency-varying gradients — measured min pairwise distance 14 on
# the fixture generator, far above the threshold 6) with a planted
# near-duplicate (+2 brightness, distance 0) for every 10th doc. The
# operator must find EXACTLY the planted pairs — perfect precision AND
# recall — so the oracle is the plain planted-pair enumeration: one
# false positive or miss breaks the hash. (The pHash VALUES are
# implementation detail and stay out of the result.)
# --------------------------------------------------------------------------

_Q209_SQL = """
SELECT doc_id AS id_a,
       CAST(doc_id + 1000000 AS BIGINT) AS id_b
FROM documents
WHERE doc_id % 10 = 0
"""


@query("q209_image_phash_dedup", oracle=_Q209_SQL, tags=("multimodal", "dedup"))
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs via 64-bit DCT pHash + pigeonhole hamming
    banding (operators/multimodal.py): map-only hashing out of the
    image scan, a (band, value) equi-join for candidates — Σ bucket²,
    never all-pairs — and a codegen xor+bit_count verify."""
    import numpy as np
    import pandas as pd

    from march_mania_spark_lakehouse_spark.operators import multimodal as M
    from march_mania_spark_lakehouse_spark.operators.dedup import rebalance_scan

    docs = catalog.load(spark, "documents", sf_dir).select("doc_id")

    def _images(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc in pdf["doc_id"]:
                doc = int(doc)
                h, w = 16 + doc % 9, 16 + (doc * 3) % 9
                y, x = np.mgrid[0:h, 0:w]
                v = (
                    x * (7 + doc % 50)
                    + y * (13 + (doc * 3) % 50)
                    + x * y * (3 + doc % 11)
                    + doc
                ) * 40503 % 65536
                px = (v * 200 // 65536).astype(np.uint8)
                px3 = np.stack([px] * 3, axis=-1)
                ids.append(doc)
                payloads.append(M.encode_bmp(px3))
                if doc % 10 == 0:  # planted near-dup: +2 brightness
                    ids.append(doc + 1_000_000)
                    payloads.append(
                        M.encode_bmp((px3.astype(np.int64) + 2).astype(np.uint8))
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = rebalance_scan(docs).mapInPandas(
        _images, schema="media_id long, payload binary"
    )
    hashes = M.image_phash(media)
    pairs = M.phash_near_dup_pairs(hashes, max_distance=6)
    return pairs.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )
