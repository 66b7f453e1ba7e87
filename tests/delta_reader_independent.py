"""A minimal INDEPENDENT Delta-protocol reader for interop testing.

Clean-room rules: this module implements snapshot reconstruction from
the public Delta transaction protocol (delta-io PROTOCOL.md) using ONLY
the standard library and pyarrow. It must never import anything from
the engine package — `tests/test_delta_interop.py` enforces that by
inspecting this file's source. The point: if a reader sharing zero code
with the writer reconstructs identical snapshots, the tables really are
the interoperable format, not merely round-trippable by their author.

Protocol surface implemented (reader side):
- commit files  ``_delta_log/%020d.json``: newline-delimited JSON
  actions; ``add`` introduces a live data file, ``remove`` tombstones
  one, the latest ``metaData`` wins (schemaString, partitionColumns).
- checkpoint    ``_delta_log/%020d.checkpoint.parquet`` + the
  ``_last_checkpoint`` pointer: one row per action, struct columns
  ``add`` / ``metaData`` / ``protocol``; replay = checkpoint rows then
  the JSON tail ``(cp_version, version]``.
- snapshot read: each live file under the version's DECLARED schema
  (columns the file lacks surface as null — schema evolution), hive
  partition columns restored from the add action's ``partitionValues``
  strings, cast per the declared type.
"""

from __future__ import annotations

import json
import os
import struct
import uuid as _uuid
import zlib

import pyarrow.parquet as pq

# --------------------------------------------------------------------------
# Deletion vectors, decoded from the PUBLIC formats alone (Delta
# PROTOCOL.md "Deletion Vectors" + the RoaringBitmap format spec +
# ZeroMQ RFC 32 Z85) — this module's own implementation, sharing zero
# code with the engine's `sources/deletion_vectors.py`.
# --------------------------------------------------------------------------

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)


def _z85_to_bytes(s: str) -> bytes:
    lut = {c: i for i, c in enumerate(_Z85_CHARS)}
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i: i + 5]:
            acc = acc * 85 + lut[c]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def _decode_roaring32(buf: bytes, at: int):
    (word,) = struct.unpack_from("<I", buf, at)
    if word & 0xFFFF == 12347:  # run-capable stream
        n = (word >> 16) + 1
        flags = buf[at + 4: at + 4 + (n + 7) // 8]
        cursor = at + 4 + len(flags)
        offset_header = n >= 4
    elif word == 12346:
        (n,) = struct.unpack_from("<I", buf, at + 4)
        flags = bytes((n + 7) // 8)
        cursor = at + 8
        offset_header = True
    else:
        raise NotImplementedError(f"roaring cookie {word}")
    header = struct.unpack_from(f"<{2 * n}H", buf, cursor)
    cursor += 4 * n
    offsets = None
    if offset_header:
        offsets = struct.unpack_from(f"<{n}I", buf, cursor)
        cursor += 4 * n
    vals: list[int] = []
    end = cursor
    for i in range(n):
        key, card = header[2 * i], header[2 * i + 1] + 1
        p = at + offsets[i] if offsets else end
        if flags[i // 8] & (1 << (i % 8)):
            (nruns,) = struct.unpack_from("<H", buf, p)
            body = struct.unpack_from(f"<{2 * nruns}H", buf, p + 2)
            for j in range(nruns):
                for v in range(body[2 * j], body[2 * j] + body[2 * j + 1] + 1):
                    vals.append((key << 16) | v)
            end = max(end, p + 2 + 4 * nruns)
        elif card <= 4096:
            vals.extend(
                (key << 16) | v
                for v in struct.unpack_from(f"<{card}H", buf, p)
            )
            end = max(end, p + 2 * card)
        else:
            for wi, w in enumerate(struct.unpack_from("<1024Q", buf, p)):
                for bit in range(64):
                    if w >> bit & 1:
                        vals.append((key << 16) | (wi << 6) | bit)
            end = max(end, p + 8192)
    return vals, end


def deleted_positions(table: str, dv: dict) -> set:
    """Decode a deletionVector descriptor into its position set."""
    if dv["storageType"] == "i":
        blob = _z85_to_bytes(dv["pathOrInlineDv"])
    else:
        if dv["storageType"] == "u":
            enc = dv["pathOrInlineDv"]
            u = _uuid.UUID(bytes=_z85_to_bytes(enc[-20:]))
            path = os.path.join(table, enc[:-20], f"deletion_vector_{u}.bin")
        else:
            path = dv["pathOrInlineDv"]
        with open(path, "rb") as f:
            assert f.read(1) == b"\x01", "unknown DV file version"
            f.seek(dv["offset"])
            (size,) = struct.unpack(">I", f.read(4))
            assert size == dv["sizeInBytes"]
            blob = f.read(size)
            (crc,) = struct.unpack(">I", f.read(4))
            assert crc == zlib.crc32(blob) & 0xFFFFFFFF, "DV CRC mismatch"
    assert struct.unpack_from("<I", blob, 0)[0] == 1681511377, "DV magic"
    (n64,) = struct.unpack_from("<Q", blob, 4)
    at = 12
    out: set = set()
    for _ in range(n64):
        (hi,) = struct.unpack_from("<I", blob, at)
        vals, at = _decode_roaring32(blob, at + 4)
        out.update((hi << 32) | v for v in vals)
    assert len(out) == dv["cardinality"], "DV cardinality mismatch"
    return out


def latest_version(table: str) -> int | None:
    log = os.path.join(table, "_delta_log")
    try:
        names = os.listdir(log)
    except FileNotFoundError:
        return None
    vs = [int(n[:20]) for n in names if n.endswith(".json") and n[:20].isdigit()]
    return max(vs, default=None)


def _read_json_commit(table: str, version: int) -> list[dict]:
    path = os.path.join(table, "_delta_log", f"{version:020d}.json")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _normalize_pv(pv) -> dict:
    """partitionValues: dict from JSON commits, list of (k, v) pairs
    from pyarrow's map type in checkpoints — normalize to dict."""
    if pv is None:
        return {}
    if isinstance(pv, dict):
        return pv
    return dict(pv)


def snapshot(table: str, version: int | None = None, use_checkpoint: bool = True):
    """Reconstruct the snapshot at ``version`` (default latest).

    Returns ``{"version", "files", "adds", "schema", "partition_columns",
    "protocol"}`` where ``files`` is the sorted live file list, ``adds``
    maps path -> {"partitionValues": dict, "stats": dict|None}, and
    ``schema`` is the parsed schemaString (latest metaData action wins).
    ``use_checkpoint=False`` forces a full JSON replay from version 0 —
    the cross-check that a checkpoint-seeded replay agrees with one that
    never touches the checkpoint.
    """
    v = latest_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"{table} has no _delta_log")
    live: dict[str, dict] = {}
    meta: dict | None = None
    protocol: dict | None = None
    start = 0

    cp_meta_path = os.path.join(table, "_delta_log", "_last_checkpoint")
    if use_checkpoint and os.path.exists(cp_meta_path):
        with open(cp_meta_path) as f:
            cp = json.load(f)
        if cp["version"] <= v:
            log = os.path.join(table, "_delta_log")
            # spec checkpoint layouts: classic single file, classic
            # multi-part (``parts`` in _last_checkpoint), or V2 — a
            # UUID-named top file whose ``sidecar`` actions point at
            # _sidecars/<uuid>.parquet files holding the adds
            if cp.get("parts"):
                n = cp["parts"]
                cp_paths = [
                    os.path.join(
                        log,
                        f"{cp['version']:020d}.checkpoint."
                        f"{i:010d}.{n:010d}.parquet",
                    )
                    for i in range(1, n + 1)
                ]
            else:
                classic = os.path.join(
                    log, f"{cp['version']:020d}.checkpoint.parquet"
                )
                if os.path.exists(classic):
                    cp_paths = [classic]
                else:
                    import re as _re

                    pre = f"{cp['version']:020d}.checkpoint."
                    # never pick a superseded multi-part PART file as
                    # the V2 top file (it holds a fraction of the adds)
                    cp_paths = [
                        os.path.join(log, sorted(
                            nm for nm in os.listdir(log)
                            if nm.startswith(pre) and nm.endswith(".parquet")
                            and not _re.fullmatch(
                                r"\d{10}\.\d{10}\.parquet", nm[len(pre):]
                            )
                        )[0])
                    ]

            def _cp_row(row):
                nonlocal meta, protocol
                add = row.get("add")
                if add and add.get("path"):
                    dv = add.get("deletionVector")
                    if dv is not None and dv.get("storageType") is None:
                        dv = None  # pyarrow all-null struct = absent
                    live[add["path"]] = {
                        "partitionValues": _normalize_pv(add.get("partitionValues")),
                        "stats": json.loads(add["stats"]) if add.get("stats") else None,
                        "deletionVector": dv,
                        "baseRowId": add.get("baseRowId"),
                        "defaultRowCommitVersion": add.get(
                            "defaultRowCommitVersion"
                        ),
                    }
                m = row.get("metaData")
                if m and m.get("schemaString"):
                    meta = m
                p = row.get("protocol")
                if p and p.get("minReaderVersion") is not None:
                    protocol = p

            for cp_path in cp_paths:
                for row in pq.read_table(cp_path).to_pylist():
                    _cp_row(row)
                    sc = row.get("sidecar")
                    if sc and sc.get("path"):
                        for srow in pq.read_table(
                            os.path.join(log, "_sidecars", sc["path"])
                        ).to_pylist():
                            _cp_row(srow)
            start = cp["version"] + 1

    for vv in range(start, v + 1):
        for a in _read_json_commit(table, vv):
            if "add" in a:
                add = a["add"]
                live[add["path"]] = {
                    "partitionValues": _normalize_pv(add.get("partitionValues")),
                    "stats": json.loads(add["stats"]) if add.get("stats") else None,
                    "deletionVector": add.get("deletionVector"),
                    "baseRowId": add.get("baseRowId"),
                    "defaultRowCommitVersion": add.get(
                        "defaultRowCommitVersion"
                    ),
                }
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
            elif "metaData" in a:
                meta = a["metaData"]
            elif "protocol" in a:
                protocol = a["protocol"]

    # metaData may predate the replay window (checkpoint is
    # self-contained per spec, so this only matters for
    # use_checkpoint=False... which replays from 0 and sees it anyway).
    if meta is None:
        raise ValueError(f"{table}: no metaData action found by version {v}")
    return {
        "version": v,
        "files": sorted(live),
        "adds": live,
        "schema": json.loads(meta["schemaString"]),
        "partition_columns": list(meta.get("partitionColumns") or []),
        "configuration": dict(meta.get("configuration") or {}),
        "protocol": protocol,
    }


def _cast_partition_value(s: str | None, type_name: str):
    """Hive partition values are strings in the log; cast per the
    declared type (the subset the fixtures use)."""
    if s is None:
        return None
    if type_name in ("long", "integer", "short", "byte"):
        return int(s)
    if type_name in ("double", "float"):
        return float(s)
    if type_name == "boolean":
        return s == "true"
    return s


def read_rows(
    table: str,
    version: int | None = None,
    use_checkpoint: bool = True,
    with_lineage: bool = False,
) -> list[tuple]:
    """Materialize the snapshot as a list of row tuples in DECLARED
    column order: data columns from the parquet files (missing ones —
    pre-schema-evolution files — as None), partition columns from the
    add action's partitionValues. ``with_lineage=True`` appends
    (_row_id, _row_commit_version) per the rowTracking rules: the
    file's MATERIALIZED columns (names from table configuration) when
    present, else baseRowId + position / defaultRowCommitVersion, else
    (None, None)."""
    snap = snapshot(table, version, use_checkpoint)
    fields = snap["schema"]["fields"]
    part_cols = set(snap["partition_columns"])
    types = {f["name"]: f["type"] for f in fields}
    # column mapping: mode=name stores PHYSICAL names pinned in each
    # field's metadata (one lookup per field); mode=id resolves by the
    # parquet footers' PARQUET:field_id against the field's
    # delta.columnMapping.id (generation-proof across renames).
    mode = snap["configuration"].get("delta.columnMapping.mode")
    mapped = mode == "name"
    phys = {
        f["name"]: (
            f.get("metadata", {}).get(
                "delta.columnMapping.physicalName", f["name"]
            )
            if mode in ("name", "id")
            else f["name"]
        )
        for f in fields
    }
    fids = (
        {
            f["name"]: int(f["metadata"]["delta.columnMapping.id"])
            for f in fields
        }
        if mode == "id"
        else {}
    )
    out: list[tuple] = []
    for path in snap["files"]:
        t = pq.read_table(os.path.join(table, path))
        cols: dict[str, list] = {}
        n = t.num_rows
        pv = snap["adds"][path]["partitionValues"]
        by_fid = {}
        if mode == "id":
            for fld in t.schema:
                raw = (fld.metadata or {}).get(b"PARQUET:field_id")
                if raw is not None:
                    by_fid[int(raw)] = fld.name
        for f in fields:
            name = f["name"]
            if name in part_cols:
                # partitionValues are keyed by PHYSICAL names (rename-
                # stable), like the file columns themselves
                val = _cast_partition_value(pv.get(phys[name]), types[name])
                cols[name] = [val] * n
                continue
            src = (
                by_fid.get(fids[name]) if mode == "id" else phys[name]
            )
            if src is not None and src in t.column_names:
                cols[name] = t.column(src).to_pylist()
            else:
                cols[name] = [None] * n
        rows = list(zip(*[cols[f["name"]] for f in fields])) if fields else []
        if with_lineage:
            conf = snap["configuration"]
            rid_col = conf.get(
                "delta.rowTracking.materializedRowIdColumnName", "_row_id"
            )
            rcv_col = conf.get(
                "delta.rowTracking.materializedRowCommitVersionColumnName",
                "_row_commit_version",
            )
            base = snap["adds"][path].get("baseRowId")
            dver = snap["adds"][path].get("defaultRowCommitVersion")
            m_rid = (
                t.column(rid_col).to_pylist()
                if rid_col in t.column_names
                else None
            )
            m_rcv = (
                t.column(rcv_col).to_pylist()
                if rcv_col in t.column_names
                else None
            )
            lin_rows = []
            for pos, r in enumerate(rows):
                if m_rid is not None and m_rid[pos] is not None:
                    rid = m_rid[pos]
                elif base is not None:
                    rid = base + pos
                else:
                    rid = None
                if rid is None:
                    rcv = None
                elif m_rcv is not None and m_rcv[pos] is not None:
                    rcv = m_rcv[pos]
                else:
                    rcv = dver
                lin_rows.append(r + (rid, rcv))
            rows = lin_rows
        dv = snap["adds"][path].get("deletionVector")
        if dv:
            dead = deleted_positions(table, dv)
            rows = [r for pos, r in enumerate(rows) if pos not in dead]
        out.extend(rows)
    return out


def file_row_count(table: str, path: str) -> int:
    """Row count straight from the parquet footer — the independent
    check against the add action's stats.numRecords."""
    return pq.ParquetFile(os.path.join(table, path)).metadata.num_rows


def file_min_max(table: str, path: str, column: str):
    """(min, max) of a column computed from the file's DATA (not its
    footer statistics, which is what the writer itself used)."""
    vals = [
        v
        for v in pq.read_table(os.path.join(table, path), columns=[column])
        .column(column)
        .to_pylist()
        if v is not None
    ]
    if not vals:
        return None, None
    return min(vals), max(vals)
