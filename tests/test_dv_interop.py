"""Cross-format deletion-vector interop (round-10): a Delta table with
live DVs converts to an Iceberg **v3** table (and back) WITHOUT
rewriting any data file and WITHOUT ever decoding a bitmap — both
formats frame their DV blobs identically (u32 BE size + magic +
portable 64-bit roaring + u32 BE CRC-32, per both public specs), so
`convert_from_delta` / `convert_to_delta` move the framed bytes
verbatim between a Delta ``.bin`` sidecar and an Iceberg Puffin file.
Only sidecar + metadata objects are new; every parity is pinned
through BOTH clean-room independent readers."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from march_mania_spark_lakehouse_spark.sources import (
    delta_log,
    deletion_vectors,
    iceberg,
)
from tests import delta_reader_independent as delta_indep
from tests import iceberg_reader_independent as ice_indep


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(n):
    return [(i, i % 5, float(i)) for i in range(n)]


def _own_parquet(root):
    return [
        os.path.join(d, f)
        for d, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_delta_dv_converts_to_iceberg_v3_zero_copy(spark, tmp_path):
    """Delta table with live DVs (two overlapping deletes) → Iceberg:
    the target is format-version 3, both independent readers agree on
    the surviving rows, no parquet is copied, and the DV bitmap bytes
    in the Puffin file are BYTE-IDENTICAL to the Delta sidecar's —
    moved, never re-encoded."""
    dt = str(tmp_path / "delta_src")
    it = str(tmp_path / "ice_dst")
    delta_log.create(
        _df(spark, _rows(100)).repartitionByRange(4, "id"), dt
    )
    delta_log.delete_where(spark, dt, "k = 3")    # 20 rows
    delta_log.delete_where(spark, dt, "id < 10")  # 10 rows, 2 shared
    want = sorted(
        (i, i % 5, float(i)) for i in range(100) if i % 5 != 3 and i >= 10
    )
    assert sorted(delta_indep.read_rows(dt)) == want  # fixture sanity

    iceberg.convert_from_delta(dt, it)
    meta = ice_indep.table_metadata(it)
    assert meta["format-version"] == 3
    assert sorted(ice_indep.read_rows(it)) == want
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    ) == want
    # zero data movement: the Iceberg dir holds sidecars/metadata only
    assert _own_parquet(it) == []
    # the framed blob bytes moved VERBATIM: per live Delta add with a
    # DV, the Puffin blob at (offset, length) equals the sidecar record
    dv_entries = {
        e["referenced_data_file"]: e for e in iceberg.snapshot_dv_entries(it)
    }
    live = delta_log._replay(dt, delta_log.latest_version(dt))
    checked = 0
    for rel, add in live.items():
        desc = add.get("deletionVector")
        if not desc:
            continue
        framed = deletion_vectors.framed_dv_bytes(dt, desc)
        e = dv_entries[os.path.abspath(os.path.join(dt, rel))]
        with open(e["puffin_path"], "rb") as f:
            f.seek(int(e["offset"]))
            assert f.read(int(e["length"])) == framed
        assert int(e["cardinality"]) == int(desc["cardinality"])
        checked += 1
    assert checked >= 2 and len(dv_entries) == checked
    # the Delta layer is untouched and still serves the same rows
    assert sorted(delta_indep.read_rows(dt)) == want


def test_converted_snapshot_cdc_contract(spark, tmp_path):
    """The conversion snapshot is ``operation='delete'`` (adds + DVs in
    ONE atomic commit): the append-only feed honestly refuses it, and
    the include_deletes feed decomposes to insert(all physical rows) +
    delete(masked rows) — net state exactly the live rows."""
    dt = str(tmp_path / "delta_src")
    it = str(tmp_path / "ice_dst")
    delta_log.create(
        _df(spark, _rows(60)).repartitionByRange(3, "id"), dt
    )
    delta_log.delete_where(spark, dt, "id % 4 = 0")  # 15 rows
    iceberg.convert_from_delta(dt, it)

    with pytest.raises(iceberg.IcebergNonAppendChangeError):
        iceberg.table_changes(spark, it, 0).collect()

    feed = iceberg.table_changes(spark, it, 0, include_deletes=True).collect()
    ins = Counter(
        (r["id"], r["k"], r["val"]) for r in feed
        if r["_change_type"] == "insert"
    )
    dels = Counter(
        (r["id"], r["k"], r["val"]) for r in feed
        if r["_change_type"] == "delete"
    )
    assert sum(ins.values()) == 60 and sum(dels.values()) == 15
    net = ins - dels
    assert sorted(net.elements()) == sorted(
        (i, i % 5, float(i)) for i in range(60) if i % 4 != 0
    )


def test_iceberg_v3_dv_converts_to_delta_zero_copy(spark, tmp_path):
    """Iceberg v3 with DVs → Delta: the deletionVectors protocol
    feature is declared, each masked add action carries a descriptor
    whose sidecar bytes equal the Puffin blob's, and engine read +
    clean-room Delta reader both serve the surviving rows over the
    ORIGINAL data files (no parquet copied)."""
    it = str(tmp_path / "ice_src")
    dt = str(tmp_path / "delta_dst")
    iceberg.create(
        _df(spark, _rows(100)).repartitionByRange(4, "id"),
        it,
        format_version=3,
    )
    iceberg.delete_where(spark, it, "k = 2")
    iceberg.delete_where(spark, it, "id >= 90")
    want = sorted(
        (i, i % 5, float(i)) for i in range(100) if i % 5 != 2 and i < 90
    )
    iceberg.convert_to_delta(it, dt)

    assert sorted(delta_indep.read_rows(dt)) == want
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    ) == want
    assert _own_parquet(dt) == []  # only the .bin sidecar + log are new
    # protocol declares the feature; descriptors are bit-moved blobs
    actions = delta_log._read_actions(delta_log._commit_path(dt, 0))
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert "deletionVectors" in proto["readerFeatures"]
    dv_entries = {
        e["referenced_data_file"]: e for e in iceberg.snapshot_dv_entries(it)
    }
    checked = 0
    for a in actions:
        add = a.get("add")
        if not add or not add.get("deletionVector"):
            continue
        e = dv_entries[add["path"]]  # unpartitioned: absolute shared path
        with open(e["puffin_path"], "rb") as f:
            f.seek(int(e["offset"]))
            blob = f.read(int(e["length"]))
        assert (
            deletion_vectors.framed_dv_bytes(dt, add["deletionVector"])
            == blob
        )
        checked += 1
    assert checked == len(dv_entries) >= 2


def test_delta_dv_round_trip_via_iceberg(spark, tmp_path):
    """Delta → Iceberg v3 → Delta over ONE set of data files: all
    three metadata layers and both independent readers serve the same
    surviving rows, and neither conversion created a parquet file."""
    d1 = str(tmp_path / "delta_orig")
    ice = str(tmp_path / "ice_mid")
    d2 = str(tmp_path / "delta_back")
    delta_log.create(
        _df(spark, _rows(80)).repartitionByRange(4, "id"), d1
    )
    delta_log.delete_where(spark, d1, "k = 1")
    want = sorted((i, i % 5, float(i)) for i in range(80) if i % 5 != 1)

    iceberg.convert_from_delta(d1, ice)
    iceberg.convert_to_delta(ice, d2)

    assert sorted(ice_indep.read_rows(ice)) == want
    assert sorted(delta_indep.read_rows(d2)) == want
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, d2).collect()
    ) == want
    assert _own_parquet(ice) == [] and _own_parquet(d2) == []
    # every add in the round-tripped table still points into d1
    for p in delta_log.snapshot_files(d2):
        assert os.path.realpath(os.path.join(d2, p)).startswith(
            os.path.realpath(d1) + os.sep
        )


def test_partitioned_delta_dv_converts(spark, tmp_path):
    """A hive-partitioned Delta source with DVs converts too: identity
    spec, hard-linked layout (same inodes — zero bytes copied), DVs
    re-keyed onto the linked paths; both readers agree."""
    dt = str(tmp_path / "delta_part")
    it = str(tmp_path / "ice_part")
    delta_log.create(_df(spark, _rows(60)), dt, partition_by=("k",))
    delta_log.delete_where(spark, dt, "id % 3 = 0")
    want = sorted(
        (i, i % 5, float(i)) for i in range(60) if i % 3 != 0
    )
    iceberg.convert_from_delta(dt, it)
    assert sorted(ice_indep.read_rows(it)) == want
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    ) == want
    # hard links: every parquet under the Iceberg layout shares an
    # inode with a file under the Delta table — no data bytes copied
    src_inodes = {os.stat(p).st_ino for p in _own_parquet(dt)}
    own = _own_parquet(it)
    assert own and all(os.stat(p).st_ino in src_inodes for p in own)


def test_eq_and_pos_delete_files_still_refuse_delta_conversion(
    spark, tmp_path
):
    """Only DVs cross the format line: v2 position-delete parquet (and
    equality deletes) still raise with the rewrite hint — Delta has no
    representation for them."""
    it = str(tmp_path / "ice_v2")
    iceberg.create(_df(spark, _rows(30)), it)  # v2: deletes → parquet
    iceberg.delete_where(spark, it, "id < 5")
    with pytest.raises(NotImplementedError, match="rewrite_position_deletes"):
        iceberg.convert_to_delta(it, str(tmp_path / "delta_refused"))
    # but upgrade + rewrite consolidates to DVs, after which it converts
    iceberg.upgrade_format_version(it, 3)
    iceberg.rewrite_position_deletes(spark, it)
    dt = str(tmp_path / "delta_ok")
    iceberg.convert_to_delta(it, dt)
    assert sorted(delta_indep.read_rows(dt)) == sorted(
        (i, i % 5, float(i)) for i in range(30) if i >= 5
    )
