"""Puffin statistics files for the Iceberg layer (public Puffin spec).

Puffin is Iceberg's container format for table-level statistics blobs —
most importantly per-column NDV (number-of-distinct-values) sketches,
the input a cost-based planner needs to choose broadcast vs shuffle
joins and to order multi-way joins. This module implements, from the
public spec only:

* the Puffin v1 container — ``Magic Blob^n Footer`` where
  ``Footer = Magic FooterPayload FooterPayloadSize Flags Magic``,
  magic bytes ``0x50 0x46 0x41 0x31`` ("PFA1"), FooterPayloadSize a
  4-byte little-endian int, Flags 4 bytes (bit 0 of byte 0 = footer
  payload compressed — we always write 0 / uncompressed), and
  FooterPayload the UTF-8 JSON FileMetadata
  ``{"blobs": [BlobMetadata...], "properties": {...}}``;
* the standard ``apache-datasketches-theta-v1`` blob: a compact,
  ordered theta sketch over the column's distinct values, with the
  spec's ``ndv`` blob property carrying the estimate as a string (the
  property an Iceberg reader may use without decoding the sketch);
* a KMV (k-minimum-values) theta sketch builder — a bottom-k theta
  sketch IS the compact ordered theta state: the k smallest 63-bit
  item hashes, with ``theta`` = the (k+1)-th smallest hash once the
  sketch saturates. Estimate = ``k * 2^63 / theta`` (unbiased
  bottom-k estimator over the [0, 2^63) hash space).

Item hashing follows the DataSketches convention so the payload is
meaningful to a DataSketches reader: MurmurHash3 x64 128 with seed
9001 over the item's canonical bytes (UTF-8 for strings, 8-byte
little-endian for longs), first 64-bit lane logically shifted right by
one (63-bit non-negative), zero values discarded. The murmur3 x64 128
implementation below is written from the public algorithm description
(Austin Appleby's public-domain reference), not copied from any
library. Byte-level serialization details of the compact theta image
(preamble layout, flags, seed hash) follow the published DataSketches
serialization notes; the ``ndv`` property remains the authoritative
interop surface either way, per the Puffin spec.

Reference parity: the reference engine (march_mania_spark_lakehouse)
has no table-statistics subsystem at all — this extends the Iceberg
layer (sources/iceberg.py) the same way real lakehouses pair tables
with Puffin stats. No reference file corresponds.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from typing import Iterable

MAGIC = b"PFA1"

# --------------------------------------------------------------------------
# MurmurHash3 x64 128 (public-domain algorithm), the DataSketches item hash
# --------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit variant; returns (h1, h2) as uint64."""
    length = len(data)
    h1 = h2 = seed & _M64
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    t = len(tail)
    if t > 8:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


_DS_SEED = 9001  # DataSketches default update seed


def datasketches_hash63(data: bytes, seed: int = _DS_SEED) -> int:
    """63-bit non-negative item hash per the DataSketches convention:
    first 64-bit murmur3-x64-128 lane, logically shifted right by 1.
    A result of 0 means "discard" (theta sketches exclude hash 0)."""
    h1, _ = murmur3_x64_128(data, seed)
    return h1 >> 1


def item_bytes(v) -> bytes:
    """Canonical item serialization: UTF-8 for strings, 8-byte LE for
    integral values (the DataSketches long/string conventions)."""
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (int,)):
        return struct.pack("<q", v)
    if isinstance(v, bytes):
        return v
    raise TypeError(f"unsupported sketch item type: {type(v).__name__}")


# --------------------------------------------------------------------------
# KMV / bottom-k theta sketch: state, estimate, compact serialization
# --------------------------------------------------------------------------

_HASH_SPACE = 1 << 63


def kmv_merge(hashes: Iterable[int], k: int) -> list[int]:
    """Merge 63-bit hashes into sorted bottom-k distinct state."""
    return sorted(set(h for h in hashes if h > 0))[:k]


def kmv_estimate(state: list[int], k: int) -> tuple[float, int]:
    """(estimate, theta). Exact count when the sketch never saturated
    (theta = 2^63); else the bottom-k estimator k·2^63/theta with
    theta = the largest retained hash's exclusive upper bound."""
    if len(state) < k:
        return float(len(state)), _HASH_SPACE
    theta = state[-1]  # retained hashes are the k smallest; bound is the k-th
    # estimate over retained-below-theta: (k-1) values < theta
    return (k - 1) * _HASH_SPACE / theta, theta


def theta_sketch_bytes(state: list[int], k: int) -> bytes:
    """Serialize bottom-k state as a compact ordered theta sketch image
    (DataSketches serial version 3, family COMPACT). Layout written
    here, per the published serialization notes: preamble longs = 1
    (empty) / 2 (exact) / 3 (estimation); byte0 = preLongs, byte1 =
    serial version 3, byte2 = family 3, byte5 = flags (READ_ONLY |
    COMPACT | ORDERED, plus EMPTY when empty), bytes 6-7 = seed hash of
    the default seed 9001; exact mode stores the retained count at
    bytes 8-11; estimation mode adds the theta long at bytes 16-23;
    then the retained hashes ascending as little-endian uint64."""
    seed_hash = _seed_hash(_DS_SEED)
    flags_base = 0b00011010  # READ_ONLY(1) | COMPACT(3) | ORDERED(4)
    if not state:
        pre = struct.pack(
            "<BBBBBBH", 1, 3, 3, 0, 0, flags_base | 0b00000100, seed_hash
        )
        return pre
    if len(state) < k:
        retained = state
        pre = struct.pack(
            "<BBBBBBH", 2, 3, 3, 0, 0, flags_base, seed_hash
        ) + struct.pack("<Ii", len(retained), 0)
        return pre + b"".join(struct.pack("<Q", h) for h in retained)
    theta = state[-1]
    retained = state[:-1]  # values strictly below theta
    pre = (
        struct.pack("<BBBBBBH", 3, 3, 3, 0, 0, flags_base, seed_hash)
        + struct.pack("<Ii", len(retained), 0)
        + struct.pack("<Q", theta)
    )
    return pre + b"".join(struct.pack("<Q", h) for h in retained)


def theta_sketch_read(data: bytes) -> tuple[list[int], int]:
    """Inverse of :func:`theta_sketch_bytes`: (retained hashes, theta)."""
    pre_longs = data[0]
    if data[1] != 3 or data[2] != 3:
        raise ValueError("not a compact theta sketch v3 image")
    if pre_longs == 1:
        return [], _HASH_SPACE
    (count,) = struct.unpack_from("<I", data, 8)
    if pre_longs == 2:
        theta, off = _HASH_SPACE, 16
    else:
        (theta,) = struct.unpack_from("<Q", data, 16)
        off = 24
    hashes = list(struct.unpack_from(f"<{count}Q", data, off))
    return hashes, theta


def _seed_hash(seed: int) -> int:
    """16-bit non-zero hash of the update seed (murmur3 of the seed
    long), the cross-sketch compatibility check DataSketches stores in
    the preamble."""
    h1, _ = murmur3_x64_128(struct.pack("<q", seed), 0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError("seed hash collision with 0")
    return sh


def theta_estimate_from_bytes(data: bytes) -> float:
    hashes, theta = theta_sketch_read(data)
    if theta == _HASH_SPACE:
        return float(len(hashes))
    return len(hashes) * _HASH_SPACE / theta


# --------------------------------------------------------------------------
# Puffin container
# --------------------------------------------------------------------------


def _zstd_codec():
    """(compress, decompress) from whichever zstd binding this runtime
    has: Python 3.14's stdlib ``compression.zstd``, else the
    ``zstandard`` package; None when neither imports — the honest
    gate's input (spec: a flagged Puffin footer payload is always
    zstd)."""
    try:
        from compression import zstd  # stdlib, Python 3.14+

        return zstd.compress, zstd.decompress
    except ImportError:
        pass
    try:
        import zstandard

        comp = zstandard.ZstdCompressor()
        deco = zstandard.ZstdDecompressor()
        return comp.compress, deco.decompress
    except ImportError:
        return None


def write_puffin(
    path: str,
    blobs: list[dict],
    properties: dict | None = None,
    compress_footer: bool = False,
) -> dict:
    """Write a Puffin file. Each blob dict: ``type`` (str), ``fields``
    (list[int] — Iceberg field ids), ``snapshot-id``, ``sequence-number``,
    ``payload`` (bytes), optional ``properties`` (str→str). Returns
    ``{"file-size-in-bytes", "file-footer-size-in-bytes", "blob-metadata"}``
    — exactly the shape the table metadata ``statistics`` entry needs.
    ``compress_footer=True`` zstd-compresses the footer payload and
    sets the spec's flag bit (requires a zstd codec — see
    :func:`_zstd_codec`)."""
    tmp = path + f".tmp{uuid.uuid4().hex}"
    blob_meta: list[dict] = []
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        off = 4
        for b in blobs:
            payload = b["payload"]
            f.write(payload)
            m = {
                "type": b["type"],
                "fields": list(b["fields"]),
                "snapshot-id": b["snapshot-id"],
                "sequence-number": b["sequence-number"],
                "offset": off,
                "length": len(payload),
            }
            if b.get("properties"):
                m["properties"] = dict(b["properties"])
            blob_meta.append(m)
            off += len(payload)
        footer_payload = json.dumps(
            {"blobs": blob_meta, "properties": dict(properties or {})}
        ).encode("utf-8")
        flags = b"\x00\x00\x00\x00"  # footer payload uncompressed
        if compress_footer:
            codec = _zstd_codec()
            if codec is None:
                raise NotImplementedError(
                    "compress_footer needs a zstd codec: neither "
                    "Python 3.14's compression.zstd nor the zstandard "
                    "package is importable in this runtime"
                )
            footer_payload = codec[0](footer_payload)
            flags = b"\x01\x00\x00\x00"  # bit 0: footer zstd-compressed
        f.write(MAGIC)
        f.write(footer_payload)
        f.write(struct.pack("<i", len(footer_payload)))
        f.write(flags)
        f.write(MAGIC)
    os.replace(tmp, path)
    footer_size = 4 + len(footer_payload) + 4 + 4 + 4
    return {
        "file-size-in-bytes": os.path.getsize(path),
        "file-footer-size-in-bytes": footer_size,
        "blob-metadata": blob_meta,
    }


def read_puffin(path: str) -> tuple[dict, list[tuple[dict, bytes]]]:
    """Read a Puffin file → (file properties, [(blob metadata, payload)]).
    Validates both leading magics, the trailing magic, and that blob
    extents stay inside the pre-footer region."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad magic)")
    (payload_size,) = struct.unpack_from("<i", data, len(data) - 12)
    flags = data[len(data) - 8 : len(data) - 4]
    payload_start = len(data) - 12 - payload_size
    if data[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError(f"{path}: footer-start magic missing")
    raw = data[payload_start : payload_start + payload_size]
    if flags[0] & 1:  # spec: flagged footer payload is zstd-compressed
        codec = _zstd_codec()
        if codec is None:
            raise NotImplementedError(
                f"{path}: footer payload is zstd-compressed; neither "
                "Python 3.14's compression.zstd nor the zstandard "
                "package is importable in this runtime"
            )
        raw = codec[1](raw)
    meta = json.loads(raw)
    out = []
    for bm in meta.get("blobs", []):
        o, ln = bm["offset"], bm["length"]
        if o < 4 or o + ln > payload_start - 4:
            raise ValueError(f"{path}: blob extent outside data region")
        out.append((bm, data[o : o + ln]))
    return meta.get("properties", {}), out
