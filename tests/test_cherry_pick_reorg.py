"""Round-13 part 3: cherry-pick publishing and REORG APPLY (PURGE).

- `iceberg.cherry_pick` — the spec's manage-snapshots
  ``cherrypick_snapshot``: publish a branch append onto a main that
  MOVED since the fork (fast_forward's ancestor rule refuses), as one
  metadata-only re-attachment commit.
- `delta_log.reorg_purge` — Delta's REORG TABLE ... APPLY (PURGE):
  rewrite only DV-carrying files, materializing their masks; clean
  files untouched; dataChange=false so the sync replays it as plain
  maintenance.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(n, lo=0):
    return [(i, i % 3, float(i)) for i in range(lo, lo + n)]


def _ids(df):
    return sorted(r.id for r in df.collect())


# ---------------------------------------------------------------- cherry-pick


def test_cherry_pick_publishes_onto_moved_main(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_df(spark, _rows(10)), t)
    iceberg.create_branch(t, "audit")
    staged = iceberg.append_to_branch(_df(spark, _rows(5, lo=100)), t, "audit")
    # main moves AFTER the fork — fast-forward must refuse
    iceberg.append(_df(spark, _rows(3, lo=50)), t)
    with pytest.raises(iceberg.IcebergRefError):
        iceberg.fast_forward(t, "audit")
    iceberg.cherry_pick(t, staged)
    got = iceberg.read_iceberg(spark, t)
    assert _ids(got) == sorted(
        list(range(10)) + list(range(50, 53)) + list(range(100, 105))
    )
    # the picked rows entered the change feed ONCE, at the new sequence
    seq_before = 2  # create=1, main append=2 (branch commit took 3)
    feed = iceberg.table_changes(spark, t, seq_before + 1)
    assert _ids(feed) == list(range(100, 105))


def test_cherry_pick_gates(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_df(spark, _rows(6)), t)
    iceberg.overwrite(_df(spark, _rows(4, lo=10)), t)
    ow = iceberg.current_metadata(t)["current-snapshot-id"]
    with pytest.raises(NotImplementedError):
        iceberg.cherry_pick(t, ow)  # only appends pick
    iceberg.create_branch(t, "b")
    staged = iceberg.append_to_branch(_df(spark, _rows(2, lo=20)), t, "b")
    iceberg.cherry_pick(t, staged)
    with pytest.raises(ValueError):
        iceberg.cherry_pick(t, staged)  # double-pick refused


def test_cherry_pick_carries_v3_row_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg.create(_df(spark, _rows(8)), t, format_version=3)
    iceberg.create_branch(t, "audit")
    staged = iceberg.append_to_branch(_df(spark, _rows(4, lo=100)), t, "audit")
    branch_ids = {
        r.id: r._row_id
        for r in iceberg.read_lineage(spark, t, snapshot_id=staged).collect()
        if r.id >= 100
    }
    iceberg.append(_df(spark, _rows(2, lo=50)), t)  # diverge main
    iceberg.cherry_pick(t, staged)
    main_ids = {
        r.id: r._row_id
        for r in iceberg.read_lineage(spark, t).collect()
        if r.id >= 100
    }
    assert main_ids == branch_ids  # branch-assigned ids published as-is
    # and no collision with main's own rows
    all_ids = [r._row_id for r in iceberg.read_lineage(spark, t).collect()]
    assert len(all_ids) == len(set(all_ids))


def test_cherry_pick_through_sync(spark, tmp_path):
    it, dt = str(tmp_path / "it"), str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(6)), it)
    iceberg.convert_to_delta(it, dt)
    iceberg.create_branch(it, "audit")
    staged = iceberg.append_to_branch(_df(spark, _rows(3, lo=100)), it, "audit")
    iceberg.append(_df(spark, _rows(2, lo=50)), it)
    iceberg.sync_to_delta(it, dt)  # mirror follows the divergence point
    iceberg.cherry_pick(it, staged)
    iceberg.sync_to_delta(it, dt)  # ...and the publish, as a plain append
    assert _ids(delta_log.read_delta(spark, dt)) == _ids(
        iceberg.read_iceberg(spark, it)
    )


# ------------------------------------------------------------- REORG (PURGE)


def test_reorg_purge_rewrites_only_dv_files(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_log.create(_df(spark, _rows(30)).repartition(3, "id"), t)
    v0 = delta_log.latest_version(t)
    live0 = delta_log._replay(t, v0)
    assert len(live0) == 3
    delta_log.delete_where(spark, t, "id < 5")
    vd = delta_log.latest_version(t)
    dv_files = {
        p
        for p, a in delta_log._replay(t, vd).items()
        if a.get("deletionVector")
    }
    assert dv_files
    clean_before = set(delta_log._replay(t, vd)) - dv_files
    v = delta_log.reorg_purge(spark, t)
    live = delta_log._replay(t, v)
    # no DV descriptors remain, clean files kept their identity
    assert not any(a.get("deletionVector") for a in live.values())
    assert clean_before <= set(live)
    assert dv_files.isdisjoint(set(live))
    assert _ids(delta_log.read_delta(spark, t)) == list(range(5, 30))
    # time travel still applies the old DVs
    assert _ids(delta_log.read_delta(spark, t, vd)) == list(range(5, 30))
    assert _ids(delta_log.read_delta(spark, t, v0)) == list(range(30))
    # idempotent: nothing left to purge
    assert delta_log.reorg_purge(spark, t) == v


def test_reorg_purge_keeps_row_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_log.create(
        _df(spark, _rows(20)).repartition(2, "id"), t, row_tracking=True
    )
    before = {
        r.id: r._row_id
        for r in delta_log.read_delta_lineage(spark, t).collect()
    }
    delta_log.delete_where(spark, t, "id % 5 = 0")
    v = delta_log.reorg_purge(spark, t)
    after = {
        r.id: r._row_id
        for r in delta_log.read_delta_lineage(spark, t).collect()
    }
    assert after == {i: rid for i, rid in before.items() if i % 5 != 0}
    assert not any(
        a.get("deletionVector") for a in delta_log._replay(t, v).values()
    )


def test_reorg_purge_through_sync(spark, tmp_path):
    dt, it = str(tmp_path / "dt"), str(tmp_path / "it")
    delta_log.create(_df(spark, _rows(24)).repartition(3, "id"), dt)
    iceberg.convert_from_delta(dt, it)
    delta_log.delete_where(spark, dt, "id % 4 = 1")
    iceberg.sync_from_delta(dt, it)
    delta_log.reorg_purge(spark, dt)
    iceberg.sync_from_delta(dt, it)  # replays as plain maintenance
    want = sorted(i for i in range(24) if i % 4 != 1)
    assert _ids(iceberg.read_iceberg(spark, it)) == want
    assert _ids(delta_log.read_delta(spark, dt)) == want
    # and the iceberg mirror carries no delete files for the head
    sid = iceberg.current_metadata(it)["current-snapshot-id"]
    assert not iceberg.snapshot_delete_files(it, sid)
    assert not iceberg.snapshot_dv_entries(it, sid)
