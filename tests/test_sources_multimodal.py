"""Sources/sinks round-trips (S1–S10) and multimodal plumbing tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import multimodal
from march_mania_spark_lakehouse_spark.sources import readers, writers


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    df = catalog.load(spark, "nation", str("/root/testdata/sf0.001"))
    dest = str(tmp_path / "nation_csv")
    df.write.mode("overwrite").option("header", True).csv(dest)
    back = readers.read_csv(spark, dest, schema=catalog.REGISTRY["nation"].schema)
    assert back.count() == df.count()
    assert back.schema == df.schema


def test_single_file_csv_export(spark, tmp_path):
    df = catalog.load(spark, "region", "/root/testdata/sf0.001")
    dest = str(tmp_path / "out" / "regions.csv")
    writers.write_single_csv(df, dest)
    assert os.path.isfile(dest)
    with open(dest) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "r_regionkey,r_name"
    assert len(lines) == 1 + df.count()


def test_partitioned_parquet_write(spark, tmp_path):
    df = catalog.load(spark, "orders", "/root/testdata/sf0.001").withColumn(
        "o_year", F.year("o_orderdate")
    )
    dest = str(tmp_path / "orders_part")
    writers.write_parquet(df, dest, partition_by=["o_year"])
    # partition pruning must reach the file listing
    part_dirs = [d for d in os.listdir(dest) if d.startswith("o_year=")]
    assert len(part_dirs) >= 5
    back = spark.read.parquet(dest).filter(F.col("o_year") == 1997)
    assert back.count() == df.filter(F.col("o_year") == 1997).count()


def test_trim_string_columns(spark):
    df = spark.createDataFrame([(1, "  a  "), (2, "b")], "id long, s string")
    out = {r["id"]: r["s"] for r in readers.trim_string_columns(df).collect()}
    assert out == {1: "a", 2: "b"}


def test_driver_json_roundtrip(tmp_path):
    dest = str(tmp_path / "params.json")
    writers.write_driver_json({"alpha": 0.65, "grid": [1, 2]}, dest)
    assert writers.read_driver_json(dest) == {"alpha": 0.65, "grid": [1, 2]}


def test_media_features_deterministic_and_shaped(spark, sf_dir):
    docs = catalog.load(spark, "documents", sf_dir).limit(50)
    payloads = multimodal.attach_fake_payload(docs, "doc_id", "text")
    feats = multimodal.extract_media_features(payloads)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert r["media_type"] == "image"
        assert len(r["feature"]) == 8
        assert 16 <= r["width"] < 32 and 16 <= r["height"] < 32
    # deterministic: same input → same features
    again = {r["media_id"]: r["feature"] for r in feats.collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first
    # n_bytes must equal the utf-8 length of the source text (ascii corpus)
    joined = feats.join(docs, feats.media_id == docs.doc_id).filter(
        F.col("n_bytes") != F.length("text")
    )
    assert joined.count() == 0


def test_resize_media_fixed_output_size(spark, sf_dir):
    docs = catalog.load(spark, "documents", sf_dir).limit(20)
    media = multimodal.attach_fake_payload(docs, "doc_id", "text")
    resized = multimodal.resize_media(media, target_w=8, target_h=8).collect()
    assert len(resized) == 20
    for r in resized:
        assert r["width"] == 8 and r["height"] == 8
        assert len(bytes(r["payload"])) == 64
    # deterministic: same input → same bytes
    again = multimodal.resize_media(media, target_w=8, target_h=8).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in resized} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }


def test_sample_frames_every_nth(spark):
    payload = bytes(range(256)) * 4  # 1024 bytes = 16 frames of 64
    df = spark.createDataFrame(
        [(1, "video", payload)], "media_id long, media_type string, payload binary"
    )
    frames = multimodal.sample_frames(df, frame_bytes=64, every_n=4).collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 4, 8, 12]
    f0 = next(bytes(r["frame_payload"]) for r in frames if r["frame_idx"] == 0)
    assert f0 == payload[:64]


# -- REAL media decode (WAV/BMP/PPM — stdlib + numpy, no codecs) -----------


def _sine_wav(freq=440.0, rate=8000, secs=0.25):
    import numpy as np

    t = np.arange(int(rate * secs)) / rate
    return multimodal.encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)


def _gradient_bmp(w=13, h=7):  # odd width exercises BMP row padding
    import numpy as np

    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[..., 0] = np.arange(w, dtype=np.uint8)[None, :] * 17
    px[..., 1] = np.arange(h, dtype=np.uint8)[:, None] * 31
    px[..., 2] = 200
    return px


def test_wav_roundtrip_real_decode():
    import numpy as np

    payload = _sine_wav()
    n_ch, rate, samples = multimodal.decode_wav(payload)
    assert (n_ch, rate) == (1, 8000)
    assert len(samples) == 2000
    # real signal properties: amplitude ~0.5 sine → rms ≈ 0.3536
    assert abs(float(np.sqrt(np.mean(samples**2))) - 0.3536) < 0.01
    assert abs(float(np.max(samples)) - 0.5) < 0.01


def test_bmp_and_ppm_roundtrip_exact_pixels():
    import numpy as np

    px = _gradient_bmp()
    assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(px)), px)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(px)), px)


def test_decode_real_dispatch_and_codec_honesty():
    import pytest as _pytest

    fmt, w, h, feat = multimodal.decode_real(_sine_wav())
    assert (fmt, w, h) == ("wav", 2000, 1)
    fmt, w, h, feat = multimodal.decode_real(multimodal.encode_bmp(_gradient_bmp()))
    assert (fmt, w, h) == ("bmp", 13, 7)
    # JPEG is now really decoded (operators/jpeg.py baseline codec)
    from march_mania_spark_lakehouse_spark.operators import jpeg as _jpeg

    import numpy as _np

    fmt, w, h, feat = multimodal.decode_real(
        _jpeg.encode(_np.full((9, 11, 3), 77, dtype=_np.uint8))
    )
    assert (fmt, w, h) == ("jpeg", 11, 9)
    # PNG is decoded too (operators/png.py, stdlib zlib + filters)
    from march_mania_spark_lakehouse_spark.operators import png as _png

    fmt, w, h, feat = multimodal.decode_real(
        _png.encode(_np.full((5, 6), 200, dtype=_np.uint8))
    )
    assert (fmt, w, h) == ("png", 6, 5)
    # MP4 magic → honest NotImplementedError, not a fake answer
    with _pytest.raises(NotImplementedError):
        multimodal.decode_real(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)


def test_extract_real_media_features_end_to_end(spark):
    """mapInPandas pipeline over a mixed WAV/BMP/PPM corpus of REAL
    payloads: decoded dims and features must match direct local decode."""
    import numpy as np

    px = _gradient_bmp()
    rows = [
        (1, bytearray(_sine_wav())),
        (2, bytearray(multimodal.encode_bmp(px))),
        (3, bytearray(multimodal.encode_ppm(px))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r
        for r in multimodal.extract_real_media_features(df).collect()
    }
    assert got[1]["format"] == "wav" and got[1]["width"] == 2000
    assert got[2]["format"] == "bmp" and (got[2]["width"], got[2]["height"]) == (13, 7)
    assert got[3]["format"] == "ppm" and (got[3]["width"], got[3]["height"]) == (13, 7)
    for mid, payload in ((1, rows[0][1]), (2, rows[1][1]), (3, rows[2][1])):
        _, _, _, feat = multimodal.decode_real(bytes(payload))
        assert np.allclose(got[mid]["feature"], feat, atol=1e-6)


def test_resize_image_real_produces_valid_bmp(spark):
    """Real resize: output payloads are decodable BMPs at the target
    size, and nearest-neighbor keeps the top-left source pixel."""
    import numpy as np

    px = _gradient_bmp(w=16, h=12)
    df = spark.createDataFrame(
        [(7, bytearray(multimodal.encode_bmp(px)))], "media_id long, payload binary"
    )
    out = multimodal.resize_image_real(df, target_w=4, target_h=3).collect()[0]
    resized = multimodal.decode_bmp(bytes(out["payload"]))
    assert resized.shape == (3, 4, 3)
    assert np.array_equal(resized[0, 0], px[0, 0])  # NN anchor pixel


def test_spectral_peak_and_band_energies():
    """Real DSP: a 440 Hz sine through the PCM WAV round trip lands its
    FFT peak at the exact bin, and its energy concentrates in the band
    containing that bin."""
    import numpy as np

    rate, n = 8000, 2048
    target_bin = 120  # f = 120 * 8000/2048 = 468.75 Hz, exactly on-bin
    f = target_bin * rate / n
    t = np.arange(n) / rate
    _ch, _r, samples = multimodal.decode_wav(
        multimodal.encode_wav(0.5 * np.sin(2 * np.pi * f * t), rate)
    )
    assert multimodal.spectral_peak_bin(samples) == target_bin
    bands = multimodal.band_energies(samples, n_bands=8)
    assert bands.shape == (8,)
    # bin 120 of 1025 rfft bins → inside band 0 (bins [0, 128))
    assert int(np.argmax(bands)) == 0
    assert bands[0] > bands[4] + 2  # orders of magnitude in log10


def test_mp4_probe_and_metadata_pipeline(spark):
    """ISO-BMFF container metadata without any codec: hand-parameterized
    boxes parse back exactly, corrupt payloads raise, and the
    mapInPandas metadata stage dispatches mixed media correctly."""
    import numpy as np
    import pytest as _pytest

    from march_mania_spark_lakehouse_spark.operators import jpeg, mp4, png

    p = mp4.build_minimal_mp4(1920, 1080, duration_ms=12_345, n_tracks=3)
    info = mp4.probe(p)
    assert info == {"brand": "mp42", "duration_ms": 12_345, "n_tracks": 3,
                    "width": 1920, "height": 1080}
    with _pytest.raises(ValueError):
        mp4.probe(b"this is not a box tree")

    px = np.full((9, 11, 3), 50, dtype=np.uint8)
    rows = [
        (1, bytearray(p)),
        (2, bytearray(_sine_wav())),               # 2000 frames @ 8 kHz
        (3, bytearray(jpeg.encode(px))),
        (4, bytearray(png.encode(px))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           multimodal.extract_media_metadata(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"],
            got[1]["duration_ms"], got[1]["n_tracks"]) == ("mp4", 1920, 1080,
                                                           12_345, 3)
    assert (got[2]["format"], got[2]["duration_ms"]) == ("wav", 250)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("jpeg", 11, 9)
    assert (got[4]["format"], got[4]["width"], got[4]["height"]) == ("png", 11, 9)


def test_mjpeg_mp4_mux_demux_decode_roundtrip():
    """Real sample tables: mux independent JPEGs, walk stsc/stsz/stco
    back to the exact sample bytes, decode to the exact solid greys
    (the q174 bit-exactness argument, extended through the container)."""
    import numpy as np

    from march_mania_spark_lakehouse_spark.operators import jpeg, mp4

    greys = [10, 200, 99, 0, 255]
    frames = [
        jpeg.encode(np.full((16, 24, 3), g, dtype=np.uint8)) for g in greys
    ]
    payload = mp4.build_mjpeg_mp4(frames, 24, 16, fps=5)
    info = mp4.probe(payload)
    assert (info["width"], info["height"], info["n_tracks"]) == (24, 16, 1)
    assert info["duration_ms"] == len(greys) * 200
    samples = mp4.extract_samples(payload)
    assert samples == frames  # byte-exact demux
    for s, g in zip(samples, greys):
        decoded = jpeg.decode(s)
        assert decoded.shape == (16, 24, 3)
        assert (decoded == g).all()
    # decode_real dispatches ISO-BMFF → MJPEG frame decode
    fmt, w, h, feat = multimodal.decode_real(payload)
    assert (fmt, w, h) == ("mp4-mjpeg", 24, 16)
    assert feat.shape == (8,)
    # metadata-only fixtures (no sample tables) still refuse honestly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mp4.extract_samples(mp4.build_minimal_mp4(64, 48, 1000))


def test_extract_samples_multi_chunk_stsc_walk():
    """General §8.7.4 chunk map: samples spread over multiple chunks
    with a run-length stsc — hand-built container, since the fixture
    writer always emits one chunk."""
    import struct

    from march_mania_spark_lakehouse_spark.operators import mp4

    samples = [bytes([i]) * (3 + i) for i in range(5)]

    def _box(tag, body):
        return struct.pack(">I4s", 8 + len(body), tag) + body

    # chunks: #1 holds 2 samples, #2 holds 2, #3 holds 1
    base = mp4.build_mjpeg_mp4([b"x"], 8, 8)  # template for headers
    # rebuild stbl by hand
    stsd_body = struct.pack(">B3xI", 0, 1) + _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 8, 8) + b"\x00" * 46,
    )
    mdat_payload = b"".join(samples)
    ftyp = _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
    sizes = [len(s) for s in samples]
    chunk_offsets_rel = [0, sizes[0] + sizes[1], sum(sizes[:4])]

    def moov(off0):
        stsd = _box(b"stsd", stsd_body)
        stts = _box(b"stts", struct.pack(">B3xI", 0, 1) + struct.pack(">II", 5, 100))
        stsc = _box(
            b"stsc",
            struct.pack(">B3xI", 0, 2)
            + struct.pack(">III", 1, 2, 1)   # chunks 1-2: 2 samples each
            + struct.pack(">III", 3, 1, 1),  # chunk 3: 1 sample
        )
        stsz = _box(
            b"stsz",
            struct.pack(">B3xII", 0, 0, 5)
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        stco = _box(
            b"stco",
            struct.pack(">B3xI", 0, 3)
            + b"".join(struct.pack(">I", off0 + r) for r in chunk_offsets_rel),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        hdlr = _box(
            b"hdlr",
            struct.pack(">B3xI4s", 0, 0, b"vide") + b"\x00" * 12 + b"v\x00",
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">B3xII", 0, 0, 0) + struct.pack(">II", 1000, 500)
            + struct.pack(">HH", 0x55C4, 0),
        )
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", mdia)
        return _box(b"moov", trak)

    m_len = len(moov(0))
    payload = ftyp + moov(len(ftyp) + m_len + 8) + _box(b"mdat", mdat_payload)
    assert mp4.extract_samples(payload) == samples
