"""Reverse continuous sync (round-10): after `iceberg.convert_to_delta`,
`iceberg.sync_to_delta` replays each new Iceberg snapshot onto the
Delta mirror — one commit per snapshot, computed as a state diff
against the parent, zero data movement. Symmetric counterpart of
`tests/test_delta_sync.py`; every parity is pinned through the Delta
clean-room independent reader."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg
from tests import delta_reader_independent as delta_indep


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(lo, hi):
    return [(i, i % 5, float(i)) for i in range(lo, hi)]


def _mirror_rows(spark, dt):
    eng = sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    )
    assert sorted(delta_indep.read_rows(dt)) == eng
    return eng


def _ice_rows(spark, it):
    return sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    )


@pytest.fixture()
def pair(spark, tmp_path):
    it = str(tmp_path / "ice_src")
    dt = str(tmp_path / "delta_mirror")
    iceberg.create(
        _df(spark, _rows(0, 40)).repartitionByRange(2, "id"),
        it,
        format_version=3,
    )
    iceberg.convert_to_delta(it, dt)
    return it, dt


def test_reverse_sync_appends_and_idempotency(spark, pair):
    it, dt = pair
    iceberg.append(_df(spark, _rows(40, 50)), it)
    iceberg.append(_df(spark, _rows(50, 60)), it)
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # one commit per snapshot, cursor-stamped
    assert delta_log.latest_version(dt) == 2
    _, params = delta_log._commit_operation(dt, 2)
    assert params["sourceSequence"] == "3"
    # the mirrored appends feed as plain inserts on the Delta side
    got = sorted(
        r["id"] for r in delta_log.table_changes(spark, dt, 0).collect()
    )
    assert got == list(range(40, 60))
    # idempotent
    assert iceberg.sync_to_delta(it, dt) == 2


def test_reverse_sync_dv_delete_decomposes_in_delta_feed(spark, pair):
    it, dt = pair
    iceberg.delete_where(spark, it, "k = 3")          # v3 → Puffin DV
    iceberg.delete_where(spark, it, "id < 10")        # merges + replaces
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # the mirror's adds carry descriptors whose sidecar bytes equal the
    # Puffin blobs (moved verbatim)
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
        e = dv_entries[rel if os.path.isabs(rel) else None]
        with open(e["puffin_path"], "rb") as f:
            f.seek(int(e["offset"]))
            assert f.read(int(e["length"])) == (
                deletion_vectors.framed_dv_bytes(dt, desc)
            )
        checked += 1
    assert checked == len(dv_entries) >= 1
    # Delta's own change feed decomposes the synced DV commits and
    # folds to the head
    feed = delta_log.table_changes(
        spark, dt, 0, include_deletes=True
    ).collect()
    state = Counter(delta_indep.read_rows(dt, 0))  # conversion baseline
    for r in feed:
        state[(r.id, r.k, r.val)] += (
            1 if r._change_type == "insert" else -1
        )
    assert sorted((+state).elements()) == _mirror_rows(spark, dt)


def test_reverse_sync_update_where(spark, pair):
    it, dt = pair
    iceberg.update_where(
        spark, it, "id % 4 = 0", {"val": F.col("val") + 1000.0}
    )
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)


def test_reverse_sync_compaction_is_feed_invisible(spark, pair):
    it, dt = pair
    iceberg.append(_df(spark, _rows(40, 45)), it)
    iceberg.optimize(spark, it, small_file_bytes=1 << 30)
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # the compaction commit is dataChange=false on the mirror: the
    # append-only feed over the whole range still works
    got = sorted(
        r["id"] for r in delta_log.table_changes(spark, dt, 0).collect()
    )
    assert got == list(range(40, 45))


def test_reverse_sync_overwrite_reads_exact(spark, pair):
    it, dt = pair
    iceberg.overwrite(_df(spark, _rows(100, 110)), it)
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    with pytest.raises(delta_log.DeltaNonAppendChangeError):
        delta_log.table_changes(spark, dt, 0, include_deletes=True).collect()


def test_reverse_sync_partitioned_hard_links(spark, tmp_path):
    it = str(tmp_path / "ice_part")
    dt = str(tmp_path / "delta_part")
    iceberg.create(
        _df(spark, _rows(0, 30)), it, partition_by=("k",),
        format_version=3,
    )
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _rows(30, 45)), it)
    iceberg.delete_where(spark, it, "id % 3 = 0")
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    src_inodes = {
        os.stat(os.path.join(d, f)).st_ino
        for d, _, fs in os.walk(it)
        for f in fs
        if f.endswith(".parquet")
    }
    own = [
        os.path.join(d, f)
        for d, _, fs in os.walk(dt)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert own and all(os.stat(p).st_ino in src_inodes for p in own)


def test_reverse_sync_gates(spark, pair, tmp_path):
    it, dt = pair
    # equality deletes cannot be represented
    iceberg.delete_by_equality(
        spark, it, spark.createDataFrame([(1,)], "id long")
    )
    with pytest.raises(NotImplementedError, match="equality"):
        iceberg.sync_to_delta(it, dt)
    # a foreign commit on the mirror means it diverged
    it2 = str(tmp_path / "ice2")
    dt2 = str(tmp_path / "delta2")
    iceberg.create(_df(spark, _rows(0, 5)), it2, format_version=3)
    iceberg.convert_to_delta(it2, dt2)
    delta_log.append(_df(spark, _rows(5, 8)), dt2)
    iceberg.append(_df(spark, _rows(5, 8)), it2)
    with pytest.raises(ValueError, match="diverged"):
        iceberg.sync_to_delta(it2, dt2)


def test_reverse_sync_replays_merge_schema_append(spark, tmp_path):
    """A merge-schema append (new column + data in ONE snapshot)
    replays (round 11): the mirror's schema evolves in its own
    cursor-stamped commit, then the snapshot lands on top."""
    it = str(tmp_path / "ice3")
    dt = str(tmp_path / "delta3")
    iceberg.create(_df(spark, _rows(0, 5)), it, format_version=3)
    iceberg.convert_to_delta(it, dt)
    wide = spark.createDataFrame(
        [(100, 0, 1.0, "x")], "id long, k long, val double, note string"
    )
    iceberg.append(wide, it, merge_schema=True)
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    sch = delta_log.table_schema(dt)
    assert [f.name for f in sch.fields] == ["id", "k", "val", "note"]
    # pre-evolution rows read null on both layers
    assert {
        r.note
        for r in delta_log.read_delta(spark, dt).filter("id < 5").collect()
    } == {None}


def test_reverse_sync_replays_add_with_write_default(spark, pair):
    it, dt = pair
    iceberg.add_column(it, "score", "long", write_default=7)
    iceberg.append(_df(spark, _rows(40, 45)), it)  # omits → filled 7
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    import json

    md = delta_log._latest_metadata(dt, delta_log.latest_version(dt))
    fld = {
        f["name"]: f for f in json.loads(md["schemaString"])["fields"]
    }["score"]
    assert fld["metadata"]["CURRENT_DEFAULT"] == "7"
    proto = delta_log._effective_protocol(dt, delta_log.latest_version(dt))
    assert "allowColumnDefaults" in proto["writerFeatures"]
    eng = {
        r.id: r.score for r in delta_log.read_delta(spark, dt).collect()
    }
    assert all(eng[i] is None for i in range(40))
    assert all(eng[i] == 7 for i in range(40, 45))


def test_reverse_sync_initial_default_raises(spark, pair):
    it, dt = pair
    iceberg.add_column(it, "grade", "long", default=3)
    with pytest.raises(
        iceberg.DeltaSyncSchemaChangeError, match="initial-default"
    ):
        iceberg.sync_to_delta(it, dt)


def test_reverse_sync_replays_widen(spark, tmp_path):
    it = str(tmp_path / "ice_widen")
    dt = str(tmp_path / "delta_widen")
    iceberg.create(
        spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 2.0)], "id long, k int, val double"
        ),
        it,
        format_version=3,
    )
    iceberg.convert_to_delta(it, dt)
    iceberg.widen_column(it, "k", "long")
    iceberg.append(
        spark.createDataFrame(
            [(3, 3_000_000_000, 3.0)], "id long, k long, val double"
        ),
        it,
    )
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    assert delta_log.table_schema(dt)["k"].dataType.simpleString() == (
        "bigint"
    )


def test_reverse_sync_rename_flips_mirror_to_id_mapping(spark, pair):
    """RENAME replays metadata-only (column mapping enabled with the
    ICEBERG FIELD ID, physical name pinned to what the staged files
    store). A LATER Iceberg data file carries the NEW physical name —
    since every data file this engine writes is stamped with parquet
    FIELD IDS, the sync flips the mirror to columnMapping.mode=id in
    one cursor-stamped commit and resolution becomes generation-proof:
    pre-rename files (old name), post-rename files (new name), and
    future appends all serve through id resolution, pinned by the
    engine AND the clean-room reader."""
    it, dt = pair
    iceberg.rename_column(it, "val", "amount")
    iceberg.sync_to_delta(it, dt)  # trailing metadata-only reconcile
    sch = delta_log.table_schema(dt)
    assert [f.name for f in sch.fields] == ["id", "k", "amount"]
    mapping = delta_log.column_mapping(dt)
    assert mapping["amount"] == "val"
    import json

    md = delta_log._latest_metadata(dt, delta_log.latest_version(dt))
    fld = {
        f["name"]: f for f in json.loads(md["schemaString"])["fields"]
    }["amount"]
    meta = iceberg.current_metadata(it)
    decl = meta["schemas"][meta["current-schema-id"]]
    ice_fid = {f["name"]: f["id"] for f in decl["fields"]}["amount"]
    assert fld["metadata"]["delta.columnMapping.id"] == ice_fid
    # existing rows read under the new name on both layers
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # idempotent: nothing new to replay
    v = delta_log.latest_version(dt)
    iceberg.sync_to_delta(it, dt)
    assert delta_log.latest_version(dt) == v
    # a post-rename data file stores the NEW physical name → the
    # mirror flips to id mapping and keeps serving exactly
    iceberg.append(
        spark.createDataFrame(
            [(99, 0, 9.0)], "id long, k long, amount double"
        ),
        it,
    )
    iceberg.sync_to_delta(it, dt)
    md2 = delta_log._latest_metadata(dt, delta_log.latest_version(dt))
    assert (md2.get("configuration") or {})[
        "delta.columnMapping.mode"
    ] == "id"
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # a further rename + append keeps replaying on the id-mapped mirror
    iceberg.rename_column(it, "amount", "price")
    iceberg.append(
        spark.createDataFrame(
            [(100, 1, 10.0)], "id long, k long, price double"
        ),
        it,
    )
    iceberg.delete_where(spark, it, "id = 99")
    iceberg.sync_to_delta(it, dt)
    assert [f.name for f in delta_log.table_schema(dt).fields] == [
        "id", "k", "price"
    ]
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # Delta's OWN writer stamps ids on the id-mapped mirror... but the
    # mirror is sync-owned; instead pin the stream source's honest gate
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        _DeltaTableCdcStreamReader,
    )

    rdr = _DeltaTableCdcStreamReader({"path": dt})
    with pytest.raises(NotImplementedError, match="mode=id"):
        rdr.read({"version": 0})


def test_reverse_sync_rename_without_field_ids_still_raises(
    spark, tmp_path
):
    """The honest gate survives where it must: a mirror whose history
    contains ID-LESS data files (here: the Iceberg source was itself
    converted from a plain Delta table, so its original files carry no
    parquet field ids) cannot flip to id resolution — the sync raises
    instead of silently nulling the renamed column."""
    d0 = str(tmp_path / "origin_delta")
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror_delta")
    delta_log.create(_df(spark, _rows(0, 8)), d0)
    iceberg.convert_from_delta(d0, it)
    iceberg.convert_to_delta(it, dt)
    iceberg.rename_column(it, "val", "amount")
    iceberg.append(
        spark.createDataFrame(
            [(99, 0, 9.0)], "id long, k long, amount double"
        ),
        it,
    )
    with pytest.raises(
        iceberg.DeltaSyncSchemaChangeError, match="field ids"
    ):
        iceberg.sync_to_delta(it, dt)


def test_reverse_sync_replays_drop_then_appends(spark, pair):
    it, dt = pair
    iceberg.drop_column(it, "val")
    iceberg.append(
        spark.createDataFrame([(99, 0)], "id long, k long"), it
    )
    iceberg.sync_to_delta(it, dt)
    assert [f.name for f in delta_log.table_schema(dt).fields] == [
        "id", "k"
    ]
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)


def test_reverse_sync_rebases_over_mirror_optimize(spark, pair):
    """Foreign-commit tolerance (round 11): a mirror-side OPTIMIZE
    (dataChange=false maintenance) no longer bricks the follow loop —
    the sync supersedes it with one dataChange=false rebase commit
    restoring the last-synced layout (compaction on a mirror is wasted
    work by design), then replays normally. Genuine foreign DATA
    commits still raise."""
    it, dt = pair
    iceberg.append(_df(spark, _rows(40, 50)), it)
    iceberg.sync_to_delta(it, dt)
    delta_log.optimize(spark, dt)  # mirror-side maintenance
    iceberg.append(_df(spark, _rows(50, 55)), it)
    iceberg.delete_where(spark, it, "k = 1")
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    ops = [
        delta_log._commit_operation(dt, v)[0]
        for v in range(delta_log.latest_version(dt) + 1)
    ]
    assert "SYNC REBASE" in ops
    # the rebase is feed-invisible: the Delta change feed over the
    # whole history folds to the head
    feed = delta_log.table_changes(
        spark, dt, 0, include_deletes=True
    ).collect()
    state = Counter(delta_indep.read_rows(dt, 0))
    for r in feed:
        state[(r.id, r.k, r.val)] += 1 if r._change_type == "insert" else -1
    assert sorted((+state).elements()) == _mirror_rows(spark, dt)
    # a genuine foreign data commit still raises
    delta_log.append(_df(spark, [(999, 0, 9.0)]), dt)
    iceberg.append(_df(spark, [(998, 0, 8.0)]), it)
    with pytest.raises(ValueError, match="diverged"):
        iceberg.sync_to_delta(it, dt)


def test_reverse_sync_branch_snapshots_do_not_replay(spark, pair):
    it, dt = pair
    # a staged WAP/branch snapshot must NOT reach the mirror
    iceberg.create_branch(it, "audit")
    iceberg.append_to_branch(
        _df(spark, [(999, 0, 9.0)]), it, "audit"
    )
    iceberg.append(_df(spark, _rows(40, 42)), it)  # main lineage
    iceberg.sync_to_delta(it, dt)
    rows = _mirror_rows(spark, dt)
    assert (999, 0, 9.0) not in rows
    assert rows == _ice_rows(spark, it)
