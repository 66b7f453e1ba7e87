"""UniForm-style continuous sync (round-10): after
`iceberg.convert_from_delta`, `iceberg.sync_from_delta` replays each
subsequent Delta commit onto the Iceberg mirror — one snapshot per
Delta version, zero data movement — and BOTH clean-room independent
readers must agree at every step. Appends map to append snapshots,
DV deletes/updates move their sidecar records verbatim into Puffin
blobs, OPTIMIZE maps to feed-invisible ``replace``, overwrites map to
``overwrite`` (feeds honestly refuse), and schema evolution REPLAYS
(round 11): add/rename/widen/drop land as metadata-only Iceberg schema
generations with field-ids reconciled through the Delta column-mapping
ids; partition-column changes and name reuse still raise."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg
from tests import delta_reader_independent as delta_indep
from tests import iceberg_reader_independent as ice_indep


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(lo, hi):
    return [(i, i % 5, float(i)) for i in range(lo, hi)]


def _mirror_rows(spark, it):
    eng = sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    )
    assert sorted(ice_indep.read_rows(it)) == eng
    return eng


def _delta_rows(dt):
    return sorted(delta_indep.read_rows(dt))


@pytest.fixture()
def pair(spark, tmp_path):
    dt = str(tmp_path / "delta_src")
    it = str(tmp_path / "ice_mirror")
    delta_log.create(
        _df(spark, _rows(0, 40)).repartitionByRange(2, "id"), dt
    )
    iceberg.convert_from_delta(dt, it)
    return dt, it


def test_sync_appends_and_idempotency(spark, pair):
    dt, it = pair
    delta_log.append(_df(spark, _rows(40, 50)), dt)
    delta_log.append(_df(spark, _rows(50, 60)), dt)
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    # one snapshot per Delta version, stamped with its origin
    meta = iceberg.current_metadata(it)
    assert [
        s["summary"].get("delta-version") for s in meta["snapshots"]
    ] == [None, "1", "2"]
    assert [s["summary"]["operation"] for s in meta["snapshots"]] == [
        "append", "append", "append"
    ]
    assert meta["properties"]["migrated-delta-version"] == "2"
    # the mirrored appends feed as plain inserts
    got = sorted(
        r["id"]
        for r in iceberg.table_changes(spark, it, 1).collect()
    )
    assert got == list(range(40, 60))
    # idempotent: a second sync writes nothing
    before = iceberg.current_version(it)
    iceberg.sync_from_delta(dt, it)
    assert iceberg.current_version(it) == before


def test_sync_dv_delete_moves_bytes_verbatim(spark, pair):
    dt, it = pair
    delta_log.delete_where(spark, dt, "k = 3")
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = ice_indep.table_metadata(it)
    assert meta["format-version"] == 3  # auto-upgraded on first DV
    assert meta["snapshots"][-1]["summary"]["operation"] == "delete"
    # blob bytes moved verbatim from the Delta sidecar
    from march_mania_spark_lakehouse_spark.sources import deletion_vectors

    live = delta_log._replay(dt, delta_log.latest_version(dt))
    dv_entries = {
        e["referenced_data_file"]: e
        for e in iceberg.snapshot_dv_entries(it)
    }
    checked = 0
    for rel, add in live.items():
        desc = add.get("deletionVector")
        if not desc:
            continue
        e = dv_entries[os.path.abspath(os.path.join(dt, rel))]
        with open(e["puffin_path"], "rb") as f:
            f.seek(int(e["offset"]))
            assert f.read(int(e["length"])) == (
                deletion_vectors.framed_dv_bytes(dt, desc)
            )
        checked += 1
    assert checked == len(dv_entries) >= 1
    # overlapping second delete: the synced DV REPLACES the first
    # (Delta descriptors are complete bitmaps — ≤1 DV per file at head)
    delta_log.delete_where(spark, dt, "id < 10")
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    per_file = Counter(
        e["referenced_data_file"] for e in iceberg.snapshot_dv_entries(it)
    )
    assert per_file and max(per_file.values()) == 1


def test_sync_update_where_feeds_net_state(spark, pair):
    dt, it = pair
    delta_log.update_where(
        spark, dt, "id % 4 = 0", {"val": "val + 1000.0"}
    )
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    # the UPDATE snapshot (DVs + new files) decomposes in the
    # include_deletes feed; net state over the whole history = head
    feed = iceberg.table_changes(
        spark, it, 0, include_deletes=True
    ).collect()
    ins = Counter(
        (r["id"], r["k"], r["val"])
        for r in feed
        if r["_change_type"] == "insert"
    )
    dels = Counter(
        (r["id"], r["k"], r["val"])
        for r in feed
        if r["_change_type"] == "delete"
    )
    assert sorted((ins - dels).elements()) == _mirror_rows(spark, it)


def test_sync_optimize_is_feed_invisible_replace(spark, pair):
    dt, it = pair
    delta_log.append(_df(spark, _rows(40, 45)), dt)
    delta_log.optimize(spark, dt)
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = iceberg.current_metadata(it)
    assert meta["snapshots"][-1]["summary"]["operation"] == "replace"
    # the feed over the whole range still works (replace is skipped)
    got = sorted(
        r["id"] for r in iceberg.table_changes(spark, it, 1).collect()
    )
    assert got == list(range(40, 45))


def test_sync_overwrite_reads_exact_feeds_refuse(spark, pair):
    dt, it = pair
    delta_log.overwrite(_df(spark, _rows(100, 110)), dt)
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = iceberg.current_metadata(it)
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    with pytest.raises(iceberg.IcebergNonAppendChangeError):
        iceberg.table_changes(spark, it, 1, include_deletes=True).collect()
    # time travel to the pre-overwrite mirror snapshot still serves
    # the original rows
    first = iceberg.snapshot_ids(it)[0]
    assert sorted(ice_indep.read_rows(it, first)) == sorted(
        (i, i % 5, float(i)) for i in range(40)
    )


def test_sync_replays_widen(spark, tmp_path):
    """WIDEN COLUMN replays (round 11): the mirror's field keeps its
    id and widens its type; files narrower AND wider than the declared
    type serve together on both layers."""
    dt = str(tmp_path / "delta_widen")
    it = str(tmp_path / "ice_widen")
    delta_log.create(
        spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 2.0)], "id long, k int, val double"
        ),
        dt,
    )
    iceberg.convert_from_delta(dt, it)
    delta_log.widen_column(dt, "k", "long")
    delta_log.append(
        spark.createDataFrame(
            [(3, 3_000_000_000, 3.0)], "id long, k long, val double"
        ),
        dt,
    )
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = iceberg.current_metadata(it)
    decl = meta["schemas"][meta["current-schema-id"]]
    assert [(f["name"], f["type"]) for f in decl["fields"]] == [
        ("id", "long"), ("k", "long"), ("val", "double")
    ]
    # non-promotion retype still raises (manufactured metaData commit)
    v = delta_log.latest_version(dt)
    md = delta_log._latest_metadata(dt, v)
    import json as _json

    sj = _json.loads(md["schemaString"])
    for f in sj["fields"]:
        if f["name"] == "k":
            f["type"] = "string"
    delta_log._write_commit(
        dt, v + 1,
        [
            delta_log._commit_info("RETYPE", {}),
            {"metaData": {**md, "schemaString": _json.dumps(sj)}},
        ],
    )
    with pytest.raises(iceberg.DeltaSyncSchemaChangeError):
        iceberg.sync_from_delta(dt, it)


def test_sync_replays_add_column_with_write_default(spark, pair):
    """ADD COLUMN replays; a Delta CURRENT_DEFAULT maps to the Iceberg
    WRITE-default, never an initial-default — pre-evolution rows read
    null on BOTH layers (Delta defaults are write-time-only)."""
    dt, it = pair
    delta_log.add_column(dt, "score", "long", write_default=7)
    delta_log.append(  # omits the column → filled with 7 at write
        _df(spark, _rows(40, 45)), dt
    )
    iceberg.sync_from_delta(dt, it)
    meta = iceberg.current_metadata(it)
    decl = meta["schemas"][meta["current-schema-id"]]
    fld = {f["name"]: f for f in decl["fields"]}["score"]
    assert fld["write-default"] == 7 and "initial-default" not in fld
    eng = sorted(
        (r.id, r.score)
        for r in iceberg.read_iceberg(spark, it).collect()
    )
    assert eng == [(i, None) for i in range(40)] + [
        (i, 7) for i in range(40, 45)
    ]
    assert _mirror_rows(spark, it) == _delta_rows(dt)


def test_sync_replays_rename_and_mapped_add(spark, pair):
    """RENAME replays with the field-id kept; post-rename Delta files
    still store the OLD physical name and resolve through the mirror's
    name history. A post-mapping ADD gets a col-<uuid> physical name —
    the mirror adds under it and renames to the logical name, so every
    file generation resolves by footer."""
    dt, it = pair
    delta_log.rename_column(dt, "val", "amount")
    delta_log.append(_df(spark, _rows(40, 46)).withColumnRenamed(
        "val", "amount"), dt)
    delta_log.add_column(dt, "flag", "long")
    delta_log.append(
        spark.createDataFrame(
            [(i, i % 5, float(i), i % 2) for i in range(46, 52)],
            "id long, k long, amount double, flag long",
        ),
        dt,
    )
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = iceberg.current_metadata(it)
    decl = meta["schemas"][meta["current-schema-id"]]
    assert [f["name"] for f in decl["fields"]] == [
        "id", "k", "amount", "flag"
    ]
    # the renamed field kept its id; 'val' is in its name history
    hist = iceberg._field_name_history(meta)
    fid = {f["name"]: f["id"] for f in decl["fields"]}["amount"]
    assert hist[fid] == ["val", "amount"]
    # the mapped add's physical name is in the flag field's history
    mapping = delta_log.column_mapping(dt)
    flag_fid = {f["name"]: f["id"] for f in decl["fields"]}["flag"]
    assert hist[flag_fid] == [mapping["flag"], "flag"]
    eng = {
        r.id: r.flag for r in iceberg.read_iceberg(spark, it).collect()
    }
    assert all(eng[i] is None for i in range(46))
    assert all(eng[i] == i % 2 for i in range(46, 52))


def test_sync_replays_drop_and_refuses_name_reuse(spark, pair):
    dt, it = pair
    delta_log.drop_column(dt, "val")
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = iceberg.current_metadata(it)
    decl = meta["schemas"][meta["current-schema-id"]]
    assert [f["name"] for f in decl["fields"]] == ["id", "k"]
    # Delta re-adds the dropped LOGICAL name under a fresh physical
    # name; Iceberg physical-name resolution refuses the reuse — the
    # sync surfaces it as the honest schema gate
    delta_log.add_column(dt, "val", "double")
    with pytest.raises(iceberg.DeltaSyncSchemaChangeError):
        iceberg.sync_from_delta(dt, it)


def test_sync_partition_column_change_still_raises(spark, pair):
    dt, it = pair
    v = delta_log.latest_version(dt)
    md = delta_log._latest_metadata(dt, v)
    delta_log._write_commit(
        dt, v + 1,
        [
            delta_log._commit_info("REPARTITION", {}),
            {"metaData": {**md, "partitionColumns": ["k"]}},
        ],
    )
    with pytest.raises(
        iceberg.DeltaSyncSchemaChangeError, match="partition"
    ):
        iceberg.sync_from_delta(dt, it)


def test_sync_schema_change_on_partitioned_mirror(spark, tmp_path):
    """The add/widen/rename replay composes with identity-partitioned
    mirrors (digest-linked layout): only partition SOURCE columns are
    physically keyed, so surgery on the others replays."""
    dt = str(tmp_path / "delta_part_evo")
    it = str(tmp_path / "ice_part_evo")
    delta_log.create(_df(spark, _rows(0, 20)), dt, partition_by=("k",))
    iceberg.convert_from_delta(dt, it)
    delta_log.rename_column(dt, "val", "amount")
    delta_log.add_column(dt, "score", "long", write_default=3)
    delta_log.append(
        _df(spark, _rows(20, 30)).withColumnRenamed("val", "amount"),
        dt,
    )
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    # renaming the partition source itself still raises
    delta_log.rename_column(dt, "k", "bucket")
    with pytest.raises(iceberg.DeltaSyncSchemaChangeError):
        iceberg.sync_from_delta(dt, it)


def test_sync_partitioned_hard_links(spark, tmp_path):
    dt = str(tmp_path / "delta_part")
    it = str(tmp_path / "ice_part")
    delta_log.create(_df(spark, _rows(0, 30)), dt, partition_by=("k",))
    iceberg.convert_from_delta(dt, it)
    delta_log.append(_df(spark, _rows(30, 45)), dt)
    delta_log.delete_where(spark, dt, "id % 3 = 0")
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    # every mirror parquet shares an inode with a Delta file
    src_inodes = {
        os.stat(os.path.join(d, f)).st_ino
        for d, _, fs in os.walk(dt)
        for f in fs
        if f.endswith(".parquet")
    }
    own = [
        os.path.join(d, f)
        for d, _, fs in os.walk(it)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert own and all(os.stat(p).st_ino in src_inodes for p in own)


def test_sync_rebases_over_mirror_compaction(spark, pair):
    """Foreign-commit tolerance, Iceberg-mirror direction (round 11):
    a mirror-side compaction ('replace' snapshot) is superseded by one
    sync-rebase 'replace' snapshot re-pointing at the last sync-owned
    manifests (carried by reference), then the sync replays normally.
    Foreign DATA snapshots still raise."""
    dt, it = pair
    delta_log.append(_df(spark, _rows(40, 50)), dt)
    iceberg.sync_from_delta(dt, it)
    iceberg.optimize(spark, it, small_file_bytes=1 << 30)  # maintenance
    delta_log.append(_df(spark, _rows(50, 55)), dt)
    delta_log.delete_where(spark, dt, "k = 4")
    iceberg.sync_from_delta(dt, it)
    assert _mirror_rows(spark, it) == _delta_rows(dt)
    meta = iceberg.current_metadata(it)
    assert any(
        (s.get("summary") or {}).get("sync-rebase") == "true"
        for s in meta["snapshots"]
    )
    # a genuine foreign data snapshot still raises
    iceberg.append(_df(spark, [(999, 0, 9.0)]), it)
    delta_log.append(_df(spark, [(998, 0, 8.0)]), dt)
    with pytest.raises(ValueError, match="diverged"):
        iceberg.sync_from_delta(dt, it)


def test_sync_refuses_wrong_source_or_unconverted(spark, tmp_path, pair):
    dt, it = pair
    other = str(tmp_path / "other_delta")
    delta_log.create(_df(spark, _rows(0, 5)), other)
    with pytest.raises(ValueError, match="tracks"):
        iceberg.sync_from_delta(other, it)
    native = str(tmp_path / "native_ice")
    iceberg.create(_df(spark, _rows(0, 5)), native)
    with pytest.raises(ValueError, match="convert_from_delta"):
        iceberg.sync_from_delta(dt, native)


def test_streaming_cdc_source_follows_synced_mirror(spark, tmp_path):
    """End-to-end composition: the streaming CDC source drains an
    Iceberg mirror WHILE sync_from_delta lands Delta commits on it —
    the streamed feed equals the batch feed and folds to the mirror
    head (the continuous dual-format IVM story)."""
    from collections import Counter

    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    dt = str(tmp_path / "delta_src")
    it = str(tmp_path / "ice_mirror")
    delta_log.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"), dt
    )
    iceberg.convert_from_delta(dt, it)
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", it).load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(sink).count() == 30

    delta_log.append(_df(spark, _rows(30, 40)), dt)
    delta_log.delete_where(spark, dt, "k = 2")
    iceberg.sync_from_delta(dt, it)
    drain()

    rows = spark.read.parquet(sink).collect()
    streamed = Counter(
        (r.id, r.k, r.val, r._change_type) for r in rows
    ) - Counter((i, i % 5, float(i), "insert") for i in range(30))
    batch = Counter(
        (r.id, r.k, r.val, r._change_type)
        for r in iceberg.table_changes(
            spark, it, 1, include_deletes=True
        ).collect()
    )
    assert streamed == batch
    state = Counter()
    for r in rows:
        state[(r.id, r.k, r.val)] += (
            1 if r._change_type == "insert" else -1
        )
    assert +state == Counter(
        (r.id, r.k, r.val)
        for r in iceberg.read_iceberg(spark, it).collect()
    )


def test_sql_literal_rendering_round_trips():
    """The CURRENT_DEFAULT literal crossing the format line twice
    (render on one side, parse on the other) must be value-preserving
    for every type the sync carries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from march_mania_spark_lakehouse_spark.sources.iceberg import (
        _parse_delta_sql_literal,
        _render_delta_sql_literal,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.text(max_size=40),
            st.booleans(),
        )
    )
    def check(v):
        got = _parse_delta_sql_literal(_render_delta_sql_literal(v))
        if isinstance(v, bool):
            assert got is v
        elif isinstance(v, float):
            # int-valued floats may parse back as int — value equality
            assert float(got) == v or (got == v)
        else:
            assert got == v

    check()
