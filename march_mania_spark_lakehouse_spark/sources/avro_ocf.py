"""Minimal Avro Object Container File writer — pure stdlib.

Exists for `sources/iceberg.py`: the Iceberg table spec stores its
manifest lists and manifest files as Avro OCF, and this container ships
no avro library — but Avro's binary encoding (Apache Avro spec §
"Binary encoding") is small enough to implement directly:

- long/int: zig-zag base-128 varint
- string/bytes: length (long) + payload
- boolean: 1 byte; double: 8-byte LE IEEE; float: 4-byte LE
- record: field values in schema order, no framing
- union: branch index (long) + encoded value
- array/map: blocked — count, items, 0 terminator
- OCF: magic ``Obj\\x01`` + file-metadata map (avro.schema JSON +
  avro.codec) + 16-byte sync marker, then blocks of
  (record count, byte size, payload, sync)

Deliberately writer-only and schema-driven (no codegen, no classes):
the schema dict IS the Iceberg-spec schema including ``field-id``
attributes, so any real Avro/Iceberg reader can consume the files.
Codec is ``null`` (uncompressed) — valid per spec, simplest to verify.
The INDEPENDENT decoder used to verify these files lives in the test
suite (`tests/avro_reader_independent.py`) and shares no code with
this module.
"""

from __future__ import annotations

import io
import json
import struct


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(int(n))
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def write_string(buf: io.BytesIO, s: str) -> None:
    write_bytes(buf, s.encode("utf-8"))


def _is_nullable_union(schema) -> bool:
    return isinstance(schema, list)


def write_datum(buf: io.BytesIO, schema, value) -> None:
    """Encode ``value`` per ``schema`` (a parsed Avro schema: dict for
    record/array/map, list for union, string for primitive)."""
    if _is_nullable_union(schema):
        # unions here are always ["null", X] per the Iceberg spec
        if value is None:
            write_long(buf, schema.index("null"))
            return
        branch = 1 if schema[0] == "null" else 0
        write_long(buf, branch)
        write_datum(buf, schema[branch], value)
        return
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, value)
    elif t == "float":
        buf.write(struct.pack("<f", value))
    elif t == "double":
        buf.write(struct.pack("<d", value))
    elif t == "bytes":
        write_bytes(buf, value)
    elif t == "string":
        write_string(buf, value)
    elif t == "fixed":
        assert len(value) == schema["size"]
        buf.write(value)
    elif t == "record":
        for field in schema["fields"]:
            write_datum(buf, field["type"], value.get(field["name"]))
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                write_datum(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_string(buf, k)
                write_datum(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read_long(self) -> int:
        shift = z = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)  # un-zigzag

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = self.data[self.pos: self.pos + n]
        self.pos += n
        return out

    def read_datum(self, schema):
        if _is_nullable_union(schema):
            branch = schema[self.read_long()]
            return None if branch == "null" else self.read_datum(branch)
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            v = self.data[self.pos] != 0
            self.pos += 1
            return v
        if t in ("int", "long"):
            return self.read_long()
        if t == "float":
            v = struct.unpack_from("<f", self.data, self.pos)[0]
            self.pos += 4
            return v
        if t == "double":
            v = struct.unpack_from("<d", self.data, self.pos)[0]
            self.pos += 8
            return v
        if t == "bytes":
            return self.read_bytes()
        if t == "string":
            return self.read_bytes().decode("utf-8")
        if t == "fixed":
            v = self.data[self.pos: self.pos + schema["size"]]
            self.pos += schema["size"]
            return v
        if t == "record":
            return {f["name"]: self.read_datum(f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    self.read_long()
                for _ in range(n):
                    out.append(self.read_datum(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.read_long()
                for _ in range(n):
                    k = self.read_bytes().decode("utf-8")
                    out[k] = self.read_datum(schema["values"])
        raise NotImplementedError(f"avro type {t!r}")


def read_ocf(path: str) -> list[dict]:
    """Read an Avro OCF using the schema embedded in the file header.
    Codecs: ``null`` and ``deflate`` (raw DEFLATE block payloads per
    the Avro spec — what real Iceberg writers emit by default, so
    tables produced by other engines read without recompression)."""
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"Obj\x01":
        raise ValueError("not an Avro object container file")
    r = _Reader(data)
    r.pos = 4
    meta = r.read_datum({"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = data[r.pos: r.pos + 16]
    r.pos += 16
    out: list[dict] = []
    while r.pos < len(data):
        count = r.read_long()
        size = r.read_long()
        end = r.pos + size
        if codec == "deflate":
            # raw DEFLATE (no zlib header), per spec
            block = zlib.decompress(data[r.pos: end], wbits=-15)
            br = _Reader(block)
            for _ in range(count):
                out.append(br.read_datum(schema))
            if br.pos != len(block):
                raise ValueError("avro block size mismatch")
            r.pos = end
        else:
            for _ in range(count):
                out.append(r.read_datum(schema))
            if r.pos != end:
                raise ValueError("avro block size mismatch")
        if data[r.pos: r.pos + 16] != sync:
            raise ValueError("avro sync marker mismatch")
        r.pos += 16
    return out


def write_ocf(
    path: str, schema: dict, records: list[dict], codec: str = "null"
) -> None:
    """Write records as a single-block Avro OCF (codec ``null`` —
    simplest to verify, the default for this repo's own tables — or
    ``deflate``, raw-DEFLATE block payloads for interop fixtures). The
    sync marker is derived deterministically from the path (no RNG —
    repo policy), which the spec allows: it only needs to be
    consistent within the file."""
    import hashlib
    import zlib

    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = hashlib.md5(path.encode("utf-8")).digest()  # 16 bytes
    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    with open(path, "wb") as f:
        f.write(b"Obj\x01")
        meta = io.BytesIO()
        write_long(meta, 2)
        write_string(meta, "avro.schema")
        write_bytes(meta, json.dumps(schema).encode("utf-8"))
        write_string(meta, "avro.codec")
        write_bytes(meta, codec.encode())
        write_long(meta, 0)
        f.write(meta.getvalue())
        f.write(sync)
        block = io.BytesIO()
        write_long(block, len(records))
        write_long(block, len(payload))
        f.write(block.getvalue())
        f.write(payload)
        f.write(sync)
