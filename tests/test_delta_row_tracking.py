"""Delta ROW TRACKING (round-10): the protocol's rowTracking writer
feature — ``baseRowId``/``defaultRowCommitVersion`` on add actions, the
row-id high-water mark in a ``delta.rowTracking`` domainMetadata action
(checkpoint-persisted), materialized id columns through OPTIMIZE and
UPDATE — symmetric with `tests/test_row_lineage.py` on the Iceberg
side. Every parity is pinned through the clean-room independent
reader's own lineage decode."""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest

from march_mania_spark_lakehouse_spark.sources import delta_log as dl
from tests import delta_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(lo, hi):
    return [(i, i % 5, float(i)) for i in range(lo, hi)]


def _lineage(spark, table):
    """{id: (_row_id, _row_commit_version)} from the ENGINE, asserted
    equal to the independent reader's own decode first."""
    eng = {
        r.id: (r._row_id, r._row_commit_version)
        for r in dl.read_delta_lineage(spark, table).collect()
    }
    ind = {
        row[0]: (row[-2], row[-1])
        for row in indep.read_rows(table, with_lineage=True)
    }
    assert eng == ind
    return eng


def test_appends_assign_unique_stable_ids(spark, table):
    dl.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"),
        table,
        row_tracking=True,
    )
    dl.append(_df(spark, _rows(30, 40)), table)
    lin = _lineage(spark, table)
    assert sorted(rid for rid, _ in lin.values()) == list(range(40))
    assert {rcv for _, rcv in lin.values()} == {0, 1}
    assert dl._row_id_high_water_mark(table, 1) == 39
    # the protocol declares the feature (+ its domainMetadata dep)
    proto = dl._effective_protocol(table, 1)
    assert "rowTracking" in proto["writerFeatures"]
    assert "domainMetadata" in proto["writerFeatures"]
    assert _lineage(spark, table) == lin  # stable


def test_dv_delete_preserves_ids_and_features(spark, table):
    dl.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"),
        table,
        row_tracking=True,
    )
    before = _lineage(spark, table)
    dl.delete_where(spark, table, "k = 2")
    after = _lineage(spark, table)
    assert set(after) == {i for i in range(30) if i % 5 != 2}
    assert all(after[i] == before[i] for i in after)
    # the DV protocol upgrade UNIONED features instead of dropping
    # rowTracking
    proto = dl._effective_protocol(table, dl.latest_version(table))
    assert "rowTracking" in proto["writerFeatures"]
    assert "deletionVectors" in proto["readerFeatures"]
    # deletes consume no ids
    assert dl._row_id_high_water_mark(table, dl.latest_version(table)) == 29


def test_optimize_materializes_and_preserves(spark, table):
    dl.create(
        _df(spark, _rows(0, 30)).repartitionByRange(3, "id"),
        table,
        row_tracking=True,
    )
    dl.delete_where(spark, table, "id < 5")
    before = _lineage(spark, table)
    dl.optimize(spark, table)
    assert _lineage(spark, table) == before
    # packed files carry the configured materialized columns
    import pyarrow.parquet as pq

    live = dl._replay(table, dl.latest_version(table))
    for rel in live:
        names = pq.ParquetFile(
            os.path.join(table, rel)
        ).schema_arrow.names
        assert dl.MATERIALIZED_ROW_ID_COL in names
        assert dl.MATERIALIZED_ROW_COMMIT_COL in names


def test_update_where_carries_id_and_bumps_version(spark, table):
    dl.create(
        _df(spark, _rows(0, 20)).repartitionByRange(2, "id"),
        table,
        row_tracking=True,
    )
    before = _lineage(spark, table)
    dl.update_where(spark, table, "id % 4 = 0", {"val": "val + 100.0"})
    after = _lineage(spark, table)
    head = dl.latest_version(table)
    for i in range(20):
        rid, rcv = after[i]
        assert rid == before[i][0]
        if i % 4 == 0:
            assert rcv == head
        else:
            assert rcv == before[i][1]
    # the new adds still got spec-mandated baseRowIds (the materialized
    # column overrides them on read) — the VISIBLE ids never moved
    assert dl._row_id_high_water_mark(table, head) >= 19
    assert sorted(rid for rid, _ in after.values()) == list(range(20))


def test_hwm_survives_checkpoint_and_cleanup(spark, table):
    dl.create(_df(spark, _rows(0, 10)), table, row_tracking=True)
    dl.append(_df(spark, _rows(10, 20)), table)
    before = _lineage(spark, table)
    dl.checkpoint(table)
    # age the pre-checkpoint commits out of the log entirely
    for v in range(dl.latest_version(table)):
        p = dl._commit_path(table, v)
        os.utime(p, (1, 1))
    removed = dl.cleanup_log(table, retention_ms=0)
    assert removed
    # the checkpoint's domainMetadata row seeds the mark...
    assert dl._row_id_high_water_mark(table, dl.latest_version(table)) == 19
    # ...lineage still reads (checkpoint adds carry baseRowId)...
    assert _lineage(spark, table) == before
    # ...and the next append allocates ABOVE it, not from 0
    dl.append(_df(spark, _rows(20, 25)), table)
    lin = _lineage(spark, table)
    assert sorted(rid for rid, _ in lin.values()) == list(range(25))


@pytest.mark.parametrize(
    "layout", [{}, {"parts": 2}, {"v2": True}],
    ids=["single", "multipart", "v2"],
)
def test_hwm_survives_checkpoint_when_last_commit_has_no_hwm(
    spark, table, layout
):
    """The checkpoint itself must persist the row-id high-water mark
    (domainMetadata rows in ALL THREE layouts): when the checkpoint
    version's own commit carries no hwm action (a DV delete re-adds
    files with their existing baseRowId — no fresh ids, no hwm
    action), cleanup would otherwise strand the mark and the next
    append would restart ids at 0, duplicating live row ids."""
    dl.create(_df(spark, _rows(0, 10)), table, row_tracking=True)
    dl.append(_df(spark, _rows(10, 20)), table)
    dl.delete_where(spark, table, "k = 3")
    cp_v = dl.latest_version(table)
    # the scenario's premise: the surviving commit has NO hwm action
    assert not any(
        "domainMetadata" in a
        for a in dl._read_actions(dl._commit_path(table, cp_v))
    )
    before = _lineage(spark, table)
    dl.checkpoint(table, **layout)
    for vv in range(cp_v):
        os.utime(dl._commit_path(table, vv), (1, 1))
    assert dl.cleanup_log(table, retention_ms=0)
    assert dl._row_id_high_water_mark(table, cp_v) == 19
    assert _lineage(spark, table) == before
    dl.append(_df(spark, _rows(20, 25)), table)
    lin = _lineage(spark, table)
    live_old = {rid for rid, _ in before.values()}
    assert sorted(rid for rid, _ in lin.values()) == sorted(
        live_old | set(range(20, 25))
    )


def test_unseedable_checkpoint_raises_not_silently_reuses(spark, table):
    """A checkpoint written before domainMetadata support cannot prove
    there was no high-water mark: once cleanup removed the commits
    below it, domain recovery must RAISE (documented behavior), not
    silently restart row ids at 0."""
    import pyarrow.parquet as pq

    dl.create(_df(spark, _rows(0, 10)), table, row_tracking=True)
    dl.append(_df(spark, _rows(10, 20)), table)
    cp_v = dl.checkpoint(table)
    # simulate the pre-support layout: strip the domainMetadata column
    p = dl._checkpoint_path(table, cp_v)
    pq.write_table(pq.read_table(p).drop_columns(["domainMetadata"]), p)
    for vv in range(cp_v):
        os.utime(dl._commit_path(table, vv), (1, 1))
    assert dl.cleanup_log(table, retention_ms=0)
    with pytest.raises(FileNotFoundError, match="domain metadata"):
        dl._row_id_high_water_mark(table, cp_v)


def test_blind_append_race_rebases_row_ids(spark, table, monkeypatch):
    """Two appends racing for one version must NOT claim overlapping
    row ids: the loser's rebase shifts its baseRowIds above the
    winner's high-water mark."""
    dl.create(_df(spark, _rows(0, 10)), table, row_tracking=True)

    real = dl._write_commit
    state = {"raced": False}

    def racy(t, version, actions):
        # the first commit attempt loses to an interleaved winner
        if not state["raced"] and version == 1:
            state["raced"] = True
            win = dl._assign_row_ids(
                t,
                0,
                [
                    dl._commit_info("WRITE", {"mode": "Append"}),
                    *dl._add_actions(
                        t, dl._stage_data_files(
                            _df(spark, _rows(100, 108)), t
                        ), ()
                    ),
                ],
                1,
            )
            real(t, 1, win)
        return real(t, version, actions)

    monkeypatch.setattr(dl, "_write_commit", racy)
    dl.append(_df(spark, _rows(10, 15)), table)
    monkeypatch.setattr(dl, "_write_commit", real)

    lin = _lineage(spark, table)
    rids = sorted(rid for rid, _ in lin.values())
    assert len(lin) == 23
    assert rids == list(range(23))  # no overlap, no gap
    # the loser landed at version 2 with its ids shifted above the
    # winner's, and its defaultRowCommitVersion restamped
    assert all(
        lin[i][1] == 2 for i in range(10, 15)
    ) and all(lin[i][1] == 1 for i in range(100, 108))


def test_shallow_clone_inherits_ids_and_hwm(spark, table, tmp_path):
    dl.create(_df(spark, _rows(0, 12)), table, row_tracking=True)
    dl.delete_where(spark, table, "k = 0")
    before = _lineage(spark, table)
    clone = str(tmp_path / "clone")
    dl.shallow_clone(table, clone)
    assert _lineage(spark, clone) == before
    # the clone's own appends allocate above the inherited mark
    dl.append(_df(spark, _rows(100, 103)), clone)
    lin = _lineage(spark, clone)
    fresh = [lin[i][0] for i in range(100, 103)]
    assert sorted(fresh) == [12, 13, 14]


def test_untracked_table_refuses_lineage_read(spark, table):
    dl.create(_df(spark, _rows(0, 5)), table)
    with pytest.raises(ValueError, match="rowTracking|enableRowTracking"):
        dl.read_delta_lineage(spark, table)
