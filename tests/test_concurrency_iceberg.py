"""Optimistic concurrency for the Iceberg layer (VERDICT round-10 ask
#2, mirroring the Delta suite): the metadata-version put-if-absent
primitive resolves WHO wins; the commit layer now resolves WHAT the
loser does — blind appends verify the winner left schema/spec/format
untouched, re-attach their already-staged files at the next sequence
number, and retry; schema/spec-shaped winners and read-dependent
transactions raise for a caller re-plan."""

from __future__ import annotations

import threading

import pytest

from march_mania_spark_lakehouse_spark.sources import iceberg
from tests import iceberg_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag=0.0):
    return spark.createDataFrame(
        [(i, tag) for i in range(lo, hi)], "id long, val double"
    )


def _ids(spark, table):
    return sorted(
        r.id for r in iceberg.read_iceberg(spark, table).collect()
    )


def _inject_winner(monkeypatch, fn):
    """Arm _write_metadata so the FIRST commit attempt is beaten by
    ``fn()`` — a deterministic lost race (fn's own commits re-enter the
    patched function with the flag already cleared, so they land)."""
    real = iceberg._write_metadata
    state = {"armed": True}

    def racy(table_, meta):
        if state["armed"]:
            state["armed"] = False
            fn()
        return real(table_, meta)

    monkeypatch.setattr(iceberg, "_write_metadata", racy)


def test_blind_append_rebases_over_concurrent_append(
    spark, table, monkeypatch
):
    iceberg.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch, lambda: iceberg.append(_df(spark, 100, 105), table)
    )
    iceberg.append(_df(spark, 10, 15), table)
    want = list(range(5)) + list(range(10, 15)) + list(range(100, 105))
    assert _ids(spark, table) == want
    # sequence numbers stayed contiguous: create=1, winner=2, rebased=3
    meta = iceberg.current_metadata(table)
    assert sorted(s["sequence-number"] for s in meta["snapshots"]) == [1, 2, 3]
    # the interleaved history replays identically in the clean-room reader
    assert sorted(t[0] for t in indep.read_rows(table)) == want


def test_blind_append_rebases_over_eq_delete_sequence_rule(
    spark, table, monkeypatch
):
    """An equality-delete winner applies only to STRICTLY LOWER
    sequence numbers: the rebased append re-attaches ABOVE the
    tombstone, so its rows survive even when they match the deleted
    keys — exactly the order the commits actually serialized in."""
    iceberg.create(_df(spark, 0, 6), table)
    _inject_winner(
        monkeypatch,
        lambda: iceberg.delete_by_equality(
            spark, table,
            spark.createDataFrame([(2,), (3,)], "id long"),
        ),
    )
    # the appended batch RE-ADDS id 2 — it must outlive the tombstone
    iceberg.append(_df(spark, 2, 4, 9.9), table)
    assert _ids(spark, table) == [0, 1, 2, 3, 4, 5]
    rows = sorted(tuple(r) for r in indep.read_rows(table))
    assert (2, 9.9) in rows and (3, 9.9) in rows
    assert (2, 0.0) not in rows and (3, 0.0) not in rows


def test_blind_append_rebases_over_v3_dv_delete(spark, table, monkeypatch):
    """A deletion-vector winner on a format_version=3 table commutes
    with a blind append — the DV references only pre-existing files."""
    iceberg.create(_df(spark, 0, 10), table, format_version=3)
    _inject_winner(
        monkeypatch, lambda: iceberg.delete_where(spark, table, "id < 2")
    )
    iceberg.append(_df(spark, 50, 53), table)
    want = list(range(2, 10)) + [50, 51, 52]
    assert _ids(spark, table) == want
    assert sorted(t[0] for t in indep.read_rows(table)) == want


def test_blind_append_conflicts_with_concurrent_schema_change(
    spark, table, monkeypatch
):
    iceberg.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch, lambda: iceberg.rename_column(table, "val", "metric")
    )
    with pytest.raises(
        iceberg.IcebergConcurrentModificationError, match="schema"
    ):
        iceberg.append(_df(spark, 10, 12), table)


def test_blind_append_conflicts_with_concurrent_spec_change(
    spark, table, monkeypatch
):
    iceberg.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch,
        lambda: iceberg.evolve_partition_spec(table, ["bucket(2, id)"]),
    )
    with pytest.raises(
        iceberg.IcebergConcurrentModificationError, match="spec"
    ):
        iceberg.append(_df(spark, 10, 12), table)


def test_schema_evolving_append_raises_on_lost_race(
    spark, table, monkeypatch
):
    """merge_schema=True is a METADATA change — it registers a new
    schema entry, so it must never auto-rebase over a winner."""
    iceberg.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch, lambda: iceberg.append(_df(spark, 100, 102), table)
    )
    wide = spark.createDataFrame(
        [(10, 1.0, "x")], "id long, val double, note string"
    )
    with pytest.raises(iceberg.IcebergConcurrentCommitError):
        iceberg.append(wide, table, merge_schema=True)
    # the winner's state is intact and the loser committed nothing
    assert _ids(spark, table) == list(range(5)) + [100, 101]


def test_delete_where_raises_when_losing_to_append(
    spark, table, monkeypatch
):
    """Read-dependent op: the delete planned its tombstones against a
    snapshot the winner outdated (the appended rows match its predicate
    but its tombstones cannot cover them) — it must raise, not commit a
    partial delete."""
    iceberg.create(_df(spark, 0, 10), table)
    _inject_winner(
        monkeypatch, lambda: iceberg.append(_df(spark, 2, 4, 9.9), table)
    )
    with pytest.raises(iceberg.IcebergConcurrentCommitError):
        iceberg.delete_where(spark, table, "id < 5")
    assert _ids(spark, table) == sorted(list(range(10)) + [2, 3])


def test_many_writers_all_appends_land(spark, table):
    """Real interleaving: N threads appending concurrently through the
    public API — every append lands exactly once, sequence numbers are
    contiguous, and both readers replay the union."""
    iceberg.create(_df(spark, 0, 1), table)
    n = 6
    errs: list = []
    barrier = threading.Barrier(n)

    def writer(k):
        try:
            barrier.wait(30)
            iceberg.append(
                _df(spark, 1000 * (k + 1), 1000 * (k + 1) + 3), table
            )
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(k,)) for k in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    assert errs == []
    want = [0] + sorted(
        x for k in range(n) for x in range(1000 * (k + 1), 1000 * (k + 1) + 3)
    )
    assert _ids(spark, table) == want
    meta = iceberg.current_metadata(table)
    assert sorted(s["sequence-number"] for s in meta["snapshots"]) == list(
        range(1, n + 2)
    )
    assert sorted(t[0] for t in indep.read_rows(table)) == want


# ---------------------------------------------------------------------------
# v3 ROW LINEAGE under commit races (round 11): the rebase re-reads the
# winner's metadata and `_commit_snapshot` re-derives first_row_id from
# the refreshed next-row-id, so racing writers' id ranges must be
# DISJOINT — pinned here on format_version=3 twins of the race tests
# above, through both readers.
# ---------------------------------------------------------------------------


def _lineage(spark, table):
    """{id: (_row_id, _lus)} from the ENGINE, asserted equal to the
    independent reader's own decode first."""
    eng = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in iceberg.read_lineage(spark, table).collect()
    }
    ind = {
        row[0]: (row[-2], row[-1])
        for row in indep.read_rows(table, with_lineage=True)
    }
    assert eng == ind
    return eng


def test_blind_append_rebase_keeps_row_ids_disjoint(
    spark, table, monkeypatch
):
    iceberg.create(_df(spark, 0, 5), table, format_version=3)
    _inject_winner(
        monkeypatch, lambda: iceberg.append(_df(spark, 100, 104), table)
    )
    iceberg.append(_df(spark, 10, 13), table)
    lin = _lineage(spark, table)
    rids = sorted(rid for rid, _ in lin.values())
    assert rids == list(range(12))  # live-unique, dense, no overlap
    # the rebased loser's range sits ABOVE the winner's
    winner = {lin[i][0] for i in range(100, 104)}
    loser = {lin[i][0] for i in range(10, 13)}
    assert winner == {5, 6, 7, 8} and loser == {9, 10, 11}
    # and its sequence number is the retry's, not the planned one
    assert {lin[i][1] for i in range(10, 13)} == {3}
    assert int(iceberg.current_metadata(table)["next-row-id"]) == 12


def test_many_writers_lineage_ids_all_disjoint(spark, table):
    """Real 6-thread interleaving on a v3 table: every append lands,
    every _row_id is live-unique, and the clean-room reader agrees on
    the full lineage map."""
    iceberg.create(_df(spark, 0, 1), table, format_version=3)
    n = 6
    errs: list = []
    barrier = threading.Barrier(n)

    def writer(k):
        try:
            barrier.wait(30)
            iceberg.append(
                _df(spark, 1000 * (k + 1), 1000 * (k + 1) + 3), table
            )
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(k,)) for k in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    assert errs == []
    lin = _lineage(spark, table)
    assert len(lin) == 1 + 3 * n
    rids = sorted(rid for rid, _ in lin.values())
    assert rids == list(range(1 + 3 * n))  # disjoint, dense
    # each writer's 3-row batch got one contiguous id block
    for k in range(n):
        block = sorted(lin[1000 * (k + 1) + j][0] for j in range(3))
        assert block == list(range(block[0], block[0] + 3))
    assert int(
        iceberg.current_metadata(table)["next-row-id"]
    ) == 1 + 3 * n
