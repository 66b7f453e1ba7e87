"""A minimal INDEPENDENT Iceberg reader for interop testing.

Clean-room rules (same pattern as `tests/delta_reader_independent.py`):
built ONLY from the public Iceberg table spec and the Avro binary-
encoding spec, using stdlib json/os/struct + pyarrow for the parquet
data files. It must never import anything from the engine package —
including the engine's own Avro writer module: the Avro
object-container decoder below is its own implementation, so the
manifests are parsed by code sharing zero lines with the writer.

Covers: version-hint resolution, vN.metadata.json (schemas, partition
specs, snapshots, current pointer), manifest-list Avro, manifest Avro
(status filtering), snapshot file planning, and data materialization
with identity-partition column restoration from the manifest's typed
partition tuples (spec "identity-column projection").
"""

from __future__ import annotations

import json
import os
import struct

import pyarrow.parquet as pq


# --------------------------------------------------------------------------
# Avro binary decoding (Apache Avro spec), written from the spec
# --------------------------------------------------------------------------


class _Avro:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0

    def vlong(self) -> int:
        shift = acc = 0
        while True:
            b = self.d[self.i]
            self.i += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, n: int) -> bytes:
        out = self.d[self.i: self.i + n]
        self.i += n
        return out

    def datum(self, schema):
        if isinstance(schema, list):  # union
            return None if (b := schema[self.vlong()]) == "null" else self.datum(b)
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.raw(1) != b"\x00"
        if t in ("int", "long"):
            return self.vlong()
        if t == "float":
            return struct.unpack("<f", self.raw(4))[0]
        if t == "double":
            return struct.unpack("<d", self.raw(8))[0]
        if t in ("bytes", "string"):
            v = self.raw(self.vlong())
            return v.decode("utf-8") if t == "string" else v
        if t == "fixed":
            return self.raw(schema["size"])
        if t == "record":
            return {f["name"]: self.datum(f["type"]) for f in schema["fields"]}
        if t in ("array", "map"):
            out = [] if t == "array" else {}
            while True:
                n = self.vlong()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.vlong()  # byte-size prefix, unused
                for _ in range(n):
                    if t == "array":
                        out.append(self.datum(schema["items"]))
                    else:
                        k = self.raw(self.vlong()).decode("utf-8")
                        out[k] = self.datum(schema["values"])
        raise NotImplementedError(t)


def read_avro(path: str) -> list[dict]:
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"Obj\x01":
        raise ValueError("not an Avro OCF")
    a = _Avro(data)
    a.i = 4
    meta = a.datum({"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = a.raw(16)
    out = []
    while a.i < len(data):
        n = a.vlong()
        size = a.vlong()
        if codec == b"deflate":
            # raw DEFLATE block payload per the Avro spec
            b = _Avro(zlib.decompress(a.raw(size), wbits=-15))
            for _ in range(n):
                out.append(b.datum(schema))
        else:
            for _ in range(n):
                out.append(a.datum(schema))
        if a.raw(16) != sync:
            raise ValueError("bad sync marker")
    return out


# --------------------------------------------------------------------------
# Iceberg metadata walk
# --------------------------------------------------------------------------


def table_metadata(table: str) -> dict:
    with open(os.path.join(table, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(table, "metadata", f"v{v}.metadata.json")) as f:
        return json.load(f)


def snapshot_files(table: str, snapshot_id: int | None = None) -> list[str]:
    """Sorted relative data-file paths at a snapshot, planned from the
    manifest list + manifests only (content=0 — delete files are the
    separate merge-on-read input, `position_deletes`)."""
    meta = table_metadata(table)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    files = []
    for m in read_avro(snap["manifest-list"]):
        for e in read_avro(m["manifest_path"]):
            if e["status"] in (0, 1) and e["data_file"].get("content", 0) == 0:
                files.append(
                    os.path.relpath(
                        e["data_file"]["file_path"], os.path.abspath(table)
                    )
                )
    return sorted(files)


def _dv_blob_positions(puffin_path: str, offset: int, length: int) -> list:
    """Decode a v3 ``deletion-vector-v1`` Puffin blob from the spec
    alone: u32 BE combined length, magic D1 D3 39 64, a portable
    64-bit roaring bitmap (u64 LE bucket count, then per bucket a u32
    LE high key + 32-bit roaring stream), and a u32 BE CRC-32 of
    magic+vector. The 32-bit stream decoder is shared with the sibling
    clean-room DELTA reader — per both specs the serialization is
    byte-identical, and that module shares zero lines with the engine's
    writer."""
    import zlib

    from tests.delta_reader_independent import _decode_roaring32

    with open(puffin_path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    (size,) = struct.unpack_from(">I", blob, 0)
    data = blob[4 : 4 + size]
    (crc,) = struct.unpack_from(">I", blob, 4 + size)
    assert crc == (zlib.crc32(data) & 0xFFFFFFFF), "DV blob CRC mismatch"
    assert data[:4] == b"\xd1\xd3\x39\x64", "bad DV magic"
    (n_buckets,) = struct.unpack_from("<Q", data, 4)
    at = 12
    out: list[int] = []
    for _ in range(n_buckets):
        (hi,) = struct.unpack_from("<I", data, at)
        vals, at = _decode_roaring32(data, at + 4)
        out.extend((hi << 32) | v for v in vals)
    return out


def position_deletes(table: str, snapshot_id: int | None = None) -> set:
    """{(file_path, pos)} tombstones from the snapshot's content=1
    delete files — the spec's merge-on-read application input. Covers
    both shapes: position-delete parquet (v2) and Puffin deletion
    vectors (v3 — file_format PUFFIN, blob at
    [content_offset, content_offset+content_size_in_bytes), applying
    to referenced_data_file)."""
    meta = table_metadata(table)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    out = set()
    for m in read_avro(snap["manifest-list"]):
        for e in read_avro(m["manifest_path"]):
            if e["status"] in (0, 1) and e["data_file"].get("content", 0) == 1:
                d = e["data_file"]
                if (d.get("file_format") or "").upper() == "PUFFIN":
                    ref = d["referenced_data_file"]
                    for pos in _dv_blob_positions(
                        d["file_path"],
                        d["content_offset"],
                        d["content_size_in_bytes"],
                    ):
                        out.add((ref, pos))
                    continue
                t = pq.read_table(d["file_path"])
                out.update(
                    zip(t.column("file_path").to_pylist(),
                        t.column("pos").to_pylist())
                )
    return out


def read_rows(
    table: str,
    snapshot_id: int | None = None,
    with_lineage: bool = False,
) -> list[tuple]:
    """Materialize a snapshot as row tuples in declared-schema column
    order; identity-partition columns come from the manifests' typed
    partition records, not from the files. ``with_lineage=True``
    appends (_row_id, _last_updated_sequence_number) per the v3 row-
    lineage rules: entry ``first_row_id`` + position when inherited,
    the file's materialized ``_row_id``/``_last_updated_sequence_number``
    columns when present, else (None, None) for pre-upgrade files."""
    meta = table_metadata(table)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    # current reads use the CURRENT schema (renames/drops are
    # metadata-only and don't restamp snapshots); explicit time travel
    # reads under the snapshot's own schema-id
    schema_id = (
        meta["current-schema-id"]
        if snapshot_id is None
        else snap.get("schema-id", meta["current-schema-id"])
    )
    schema = meta["schemas"][schema_id]
    names = [f["name"] for f in schema["fields"]]
    # spec name mapping (`schema.name-mapping.default`): data files
    # written without parquet field-id annotations resolve physical
    # column names -> field-ids through this property, which the writer
    # maintains across renames. Candidates per declared field = every
    # physical name its field-id has carried.
    mapping = json.loads(
        meta.get("properties", {}).get("schema.name-mapping.default", "[]")
    )
    names_by_fid = {m["field-id"]: m["names"] for m in mapping}
    candidates = {
        f["name"]: names_by_fid.get(f["id"], [f["name"]])
        for f in schema["fields"]
    }
    spec = meta["partition-specs"][meta["default-spec-id"]]["fields"]
    # only IDENTITY-transform fields are absent from the data files and
    # restored from the manifest tuple (spec identity-column
    # projection); transform fields (day/bucket/...) are derived dir
    # values whose SOURCE columns live in the files (hidden
    # partitioning). Manifest tuples carry dates as days-since-epoch
    # and timestamps as micros (spec Appendix D representation).
    by_fid = {f["id"]: f for f in schema["fields"]}
    part_cols = {
        pf["name"]: by_fid[pf["source-id"]]["type"]
        for pf in spec
        if pf.get("transform", "identity") == "identity"
    }
    tombstones = position_deletes(table, sid)
    eq_deletes = equality_deletes(table, sid)
    out: list[tuple] = []
    for m in read_avro(snap["manifest-list"]):
        for e in read_avro(m["manifest_path"]):
            if e["status"] not in (0, 1) or e["data_file"].get("content", 0) != 0:
                continue
            df = e["data_file"]
            data_seq = e["sequence_number"]
            t = pq.read_table(df["file_path"])
            n = t.num_rows
            assert n == df["record_count"], "manifest record_count lies"
            cols = {}
            for name in names:
                if name in part_cols:
                    v = (df["partition"] or {}).get(name)
                    if v is not None and part_cols[name] == "date":
                        import datetime

                        v = datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
                    elif v is not None and part_cols[name] == "timestamptz":
                        import datetime

                        v = datetime.datetime(1970, 1, 1) + datetime.timedelta(
                            microseconds=v
                        )
                    cols[name] = [v] * n
                else:
                    phys = next(
                        (c for c in candidates[name] if c in t.column_names),
                        None,
                    )
                    if phys is not None:
                        cols[name] = t.column(phys).to_pylist()
                    else:
                        # absent from this file's footer: the v3
                        # initial-default when the field declares one,
                        # else null (pre-evolution files)
                        fld = next(
                            f for f in schema["fields"] if f["name"] == name
                        )
                        cols[name] = [fld.get("initial-default")] * n
            fp = df["file_path"]
            idx = {name: i for i, name in enumerate(names)}
            if with_lineage:
                first = df.get("first_row_id")
                file_seq = e.get("file_sequence_number") or data_seq
                phys_rid = (
                    t.column("_row_id").to_pylist()
                    if "_row_id" in t.column_names
                    else None
                )
                phys_lus = (
                    t.column("_last_updated_sequence_number").to_pylist()
                    if "_last_updated_sequence_number" in t.column_names
                    else None
                )
            for pos, row in enumerate(zip(*[cols[name] for name in names])):
                if (fp, pos) in tombstones:
                    continue
                # equality deletes: spec rule — apply only to data files
                # with a STRICTLY LOWER sequence number
                dead = any(
                    data_seq < del_seq
                    and tuple(row[idx[c]] for c in key_cols) in keyset
                    for del_seq, key_cols, keyset in eq_deletes
                )
                if dead:
                    continue
                if with_lineage:
                    if phys_rid is not None:
                        rid = phys_rid[pos]
                    elif first is not None:
                        rid = first + pos
                    else:
                        rid = None
                    if rid is None:
                        lus = None
                    elif phys_lus is not None and phys_lus[pos] is not None:
                        lus = phys_lus[pos]
                    else:
                        lus = file_seq
                    row = row + (rid, lus)
                out.append(row)
    return out


def equality_deletes(table: str, snapshot_id: int | None = None):
    """[(sequence_number, key column names, {key tuples})] from the
    snapshot's content=2 equality-delete files."""
    meta = table_metadata(table)
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    schema = meta["schemas"][snap.get("schema-id", meta["current-schema-id"])]
    by_id = {f["id"]: f["name"] for f in schema["fields"]}
    out = []
    for m in read_avro(snap["manifest-list"]):
        for e in read_avro(m["manifest_path"]):
            if e["status"] in (0, 1) and e["data_file"].get("content", 0) == 2:
                cols = [by_id[i] for i in (e["data_file"].get("equality_ids") or [])]
                t = pq.read_table(e["data_file"]["file_path"])
                keyset = set(
                    zip(*[t.column(c).to_pylist() for c in cols])
                )
                out.append((e["sequence_number"], cols, keyset))
    return out
