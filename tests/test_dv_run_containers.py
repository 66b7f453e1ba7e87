"""Run-container RoaringBitmap support in the deletion-vector codec.

Round 8: the DV reader previously gated cookie 12347 behind
NotImplementedError and the writer always emitted array/bitmap
containers. Real Delta writers (delta-rs, Databricks) emit run
containers for dense deletes, so this was the first interop wall —
and dense deletes from our own writer produced larger-than-necessary
sidecars. These tests pin:

- codec round-trips for planted dense / sparse / mixed bitmaps,
- the size-optimality rule (run emitted iff strictly smaller),
- byte-stability of the no-run layout (sparse streams unchanged),
- decode of a FOREIGN-built run stream our serializer cannot produce
  (single run container, no offset header — the <4-container layout),
- the independent clean-room reader decoding a run-container DV it
  did not write, end-to-end through ``delete_where``.
"""

from __future__ import annotations

import random
import struct

import pytest

from march_mania_spark_lakehouse_spark.sources import deletion_vectors as dv
from tests import delta_reader_independent as indep


def _rt(positions):
    got = dv.deserialize_roaring64(dv.serialize_roaring64(positions))
    assert got == sorted(set(positions))
    return dv.serialize_roaring64(positions)


def test_dense_bitmap_round_trips_as_runs_and_shrinks():
    # 60k of 65536 positions set in 3 runs: run form is ~14 bytes of
    # containers vs 8192 for the bitmap form.
    positions = (
        list(range(0, 20000))
        + list(range(20001, 45000))
        + list(range(45002, 60000))
    )
    blob = _rt(positions)
    (cookie,) = struct.unpack_from("<I", blob, 12)  # skip u64 count + u32 hi
    assert cookie & 0xFFFF == 12347
    assert len(blob) < 100  # vs ~8 KiB as a bitmap container


def test_sparse_bitmap_keeps_no_run_layout_byte_for_byte():
    positions = [i * 997 for i in range(500)]  # no two consecutive
    blob = dv.serialize_roaring64(positions)
    (cookie,) = struct.unpack_from("<I", blob, 12)
    assert cookie == 12346  # layout unchanged for sparse sets
    assert dv.deserialize_roaring64(blob) == positions


def test_mixed_containers_round_trip():
    # container 0: dense run; container 1: sparse array; container 2:
    # dense-but-scattered bitmap (every other bit: runs LOSE there —
    # 2+4*32768 > 8192); container 3 in a different 32-bit bucket.
    positions = (
        list(range(0, 5000))                                # run
        + [1 << 16 | (i * 13) for i in range(300)]          # array
        + [2 << 16 | i for i in range(0, 65536, 2)]         # bitmap
        + [7 << 32 | 42, 7 << 32 | 43, 7 << 32 | 44]        # 2nd bucket
    )
    blob = _rt(positions)
    vals, _ = dv._deserialize_roaring32(blob, 12)
    assert len(vals) == 5000 + 300 + 32768


def test_run_emitted_iff_strictly_smaller():
    # 1 run of 2 values: run=6 bytes < array=4? NO: 2+4=6 > 2*2=4 →
    # array stays. 1 run of 3 values: 6 < 6 false → array stays.
    for vals, want_run in [
        ([5, 6], False),
        ([5, 6, 7], False),           # 6 bytes either way: array wins ties
        ([5, 6, 7, 8], True),         # run 6 < array 8
        (list(range(4096)), True),
        ([i * 2 for i in range(4096)], False),  # no runs of 2+
    ]:
        blob = dv._serialize_roaring32(vals)
        (cookie,) = struct.unpack_from("<I", blob, 0)
        is_run = (cookie & 0xFFFF) == 12347
        assert is_run == want_run, vals[:4]
        got, _ = dv._deserialize_roaring32(blob, 0)
        assert got == vals


def test_foreign_run_stream_without_offset_header_decodes():
    """Hand-built stream in the <4-container run layout (offset header
    omitted per spec) — a shape our writer produces only with 1-3
    containers, decoded here from raw bytes as an external writer
    would emit them."""
    # two containers: key 0 = runs [10..19],[30..34]; key 3 = run [7..7]
    stream = struct.pack("<I", 12347 | (1 << 16))     # run cookie, n=2
    stream += bytes([0b11])                           # both are runs
    stream += struct.pack("<HH", 0, 15 - 1)           # key 0, card 15
    stream += struct.pack("<HH", 3, 0)                # key 3, card 1
    stream += struct.pack("<HHHHH", 2, 10, 9, 30, 4)  # 2 runs
    stream += struct.pack("<HHH", 1, 7, 0)            # 1 run
    blob = struct.pack("<Q", 1) + struct.pack("<I", 0) + stream
    expect = list(range(10, 20)) + list(range(30, 35)) + [3 << 16 | 7]
    assert dv.deserialize_roaring64(blob) == expect
    # the independent reader's own decoder agrees on the same bytes
    vals, _ = indep._decode_roaring32(stream, 0)
    assert sorted(vals) == expect


def test_random_sweep_round_trip_and_reader_agreement():
    rng = random.Random(20260815)
    for _ in range(12):
        n = rng.randrange(1, 4000)
        style = rng.random()
        if style < 0.4:  # runs
            base = rng.randrange(0, 1 << 20)
            positions = sorted(
                {base + i for i in range(n)} - {base + j for j in
                 rng.sample(range(n), k=min(n // 7, n - 1))}
            )
        elif style < 0.7:  # sparse
            positions = sorted(rng.sample(range(1 << 33), k=n))
        else:  # mixed buckets
            positions = sorted(
                {rng.randrange(0, 1 << 18) for _ in range(n)}
                | {(1 << 32) + rng.randrange(0, 1 << 18) for _ in range(n // 3 + 1)}
            )
        if not positions:
            continue
        blob = dv.serialize_roaring64(positions)
        assert dv.deserialize_roaring64(blob) == positions
        # independent decoder over the same 64-bit stream
        (n64,) = struct.unpack_from("<Q", blob, 0)
        at, got = 8, []
        for _ in range(n64):
            (hi,) = struct.unpack_from("<I", blob, at)
            vals, at = indep._decode_roaring32(blob, at + 4)
            got.extend((hi << 32) | v for v in vals)
        assert sorted(got) == positions


def test_dense_delete_end_to_end_both_readers(spark, tmp_path):
    """delete_where with a dense predicate now writes a run-container
    DV; the engine reader and the clean-room reader agree, and the
    sidecar is far smaller than the bitmap encoding."""
    import os

    from march_mania_spark_lakehouse_spark.sources import delta_log as dlog

    table = str(tmp_path / "dense")
    df = spark.range(0, 20000).selectExpr(
        "CAST(id AS INT) id", "CAST(id AS DOUBLE) v"
    )
    dlog.create(df, table)
    dlog.delete_where(spark, table, "id >= 100 AND id < 19000")
    keep = [i for i in range(20000) if i < 100 or i >= 19000]
    eng = sorted(r["id"] for r in dlog.read_delta(spark, table).collect())
    assert eng == keep
    ind = sorted(t[0] for t in indep.read_rows(table))
    assert ind == keep
    sidecars = [
        os.path.join(table, f) for f in os.listdir(table)
        if f.startswith("deletion_vector_")
    ]
    assert sidecars and sum(os.path.getsize(p) for p in sidecars) < 512
