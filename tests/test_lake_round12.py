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
    """When the rolled-off cursor snapshot has been expired the state
    diff is unknowable — the sync must refuse, not guess."""
    it = str(tmp_path / "ice")
    dt = str(tmp_path / "mirror")
    iceberg.create(_df(spark, _sync_rows(0, 4)), it, format_version=3)
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, _sync_rows(40, 42)), it)  # BAD
    iceberg.sync_to_delta(it, dt)
    iceberg.rollback_to_snapshot(it, good)
    iceberg.append(_df(spark, _sync_rows(50, 52)), it)
    bad = {
        s["snapshot-id"]
        for s in iceberg.current_metadata(it)["snapshots"]
    } - set()
    iceberg.expire_snapshots(it, keep_last=2)  # rolled-off BAD goes
    kept = {
        s["snapshot-id"]
        for s in iceberg.current_metadata(it)["snapshots"]
    }
    assert bad - kept  # the rolled-off snapshot really expired
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
