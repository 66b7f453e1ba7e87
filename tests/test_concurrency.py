"""Optimistic concurrency for the Delta log (VERDICT round-9 ask #2):
the put-if-absent primitive resolves WHO wins a version; the commit
layer now resolves WHAT the loser does — blind appends re-base and
retry (the spec's conflict matrix says they commute with any data-only
winner), read-dependent transactions (delete/update/overwrite/metadata)
raise DeltaConcurrentModificationError because their planned actions
reference a stale snapshot."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag=0.0):
    return spark.createDataFrame(
        [(i, tag) for i in range(lo, hi)], "id long, val double"
    )


def _ids(spark, table):
    return sorted(
        r.id for r in delta_log.read_delta(spark, table).collect()
    )


def _inject_winner(monkeypatch, fn):
    """Arm _write_commit so the FIRST commit attempt is beaten by
    ``fn()`` — a deterministic lost race (fn's own commits re-enter the
    patched function with the flag already set, so they go through)."""
    real = delta_log._write_commit
    state = {"armed": True}

    def racy(table_, version, actions):
        if state["armed"]:
            state["armed"] = False
            fn()
        return real(table_, version, actions)

    monkeypatch.setattr(delta_log, "_write_commit", racy)


def test_blind_append_rebases_over_concurrent_append(
    spark, table, monkeypatch
):
    delta_log.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch, lambda: delta_log.append(_df(spark, 100, 105), table)
    )
    v = delta_log.append(_df(spark, 10, 15), table)
    # the winner took v1; the loser re-based and landed at v2
    assert v == 2
    assert delta_log.latest_version(table) == 2
    assert _ids(spark, table) == (
        list(range(5)) + list(range(10, 15)) + list(range(100, 105))
    )
    # the interleaved log replays identically in the clean-room reader
    from tests import delta_reader_independent as clean

    assert sorted(r[0] for r in clean.read_rows(table)) == _ids(spark, table)


def test_blind_append_rebases_over_dv_delete_same_protocol(
    spark, table, monkeypatch
):
    """A DV-delete winner re-emits the deletionVectors protocol it
    already holds — a NO-OP protocol action must not fail the rebase."""
    delta_log.create(_df(spark, 0, 10), table)
    delta_log.delete_where(spark, table, "id = 0")  # v1: table is DV now
    _inject_winner(
        monkeypatch, lambda: delta_log.delete_where(spark, table, "id = 1")
    )
    v = delta_log.append(_df(spark, 50, 53), table)
    assert v == 3  # winner's DV delete at v2, rebased append at v3
    assert _ids(spark, table) == list(range(2, 10)) + [50, 51, 52]


def test_blind_append_conflicts_with_real_protocol_change(
    spark, table, monkeypatch
):
    """The FIRST DV delete upgrades the protocol (1/2 → 3/7+features):
    a concurrent blind append must refuse the rebase — its writer
    validated against the old protocol."""
    delta_log.create(_df(spark, 0, 10), table)
    _inject_winner(
        monkeypatch, lambda: delta_log.delete_where(spark, table, "id = 1")
    )
    with pytest.raises(
        delta_log.DeltaConcurrentModificationError, match="protocol"
    ):
        delta_log.append(_df(spark, 50, 53), table)


def test_blind_append_conflicts_with_concurrent_metadata_change(
    spark, table, monkeypatch
):
    delta_log.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch,
        lambda: delta_log.rename_column(table, "val", "metric"),
    )
    with pytest.raises(
        delta_log.DeltaConcurrentModificationError, match="metadata"
    ):
        delta_log.append(_df(spark, 10, 12), table)


def test_delete_where_raises_when_losing_to_append(
    spark, table, monkeypatch
):
    """The ask's conflict case: append vs delete_where on the same
    rows. The delete planned its DVs against a snapshot that no longer
    reflects the table (the appended rows MATCH its predicate but its
    tombstones cannot cover them) — it must raise, not silently commit
    a partial delete."""
    delta_log.create(_df(spark, 0, 10), table)
    _inject_winner(
        monkeypatch, lambda: delta_log.append(_df(spark, 2, 4, 9.9), table)
    )
    with pytest.raises(delta_log.DeltaConcurrentModificationError):
        delta_log.delete_where(spark, table, "id < 5")
    # the winner's rows are intact; nothing was half-deleted
    assert _ids(spark, table) == sorted(list(range(10)) + [2, 3])


def test_metadata_ops_raise_on_lost_race(spark, table, monkeypatch):
    delta_log.create(_df(spark, 0, 5), table)
    _inject_winner(
        monkeypatch, lambda: delta_log.append(_df(spark, 10, 12), table)
    )
    with pytest.raises(delta_log.DeltaConcurrentModificationError):
        delta_log.add_constraint(spark, table, "pos", "id >= 0")


def test_settransaction_idempotency_survives_race(
    spark, table, monkeypatch
):
    """Two replays of the SAME micro-batch (same appId+version) race:
    the loser must detect the winner's SetTransaction and return its
    version WITHOUT committing a duplicate copy of the batch."""
    delta_log.create(_df(spark, 0, 5), table)
    batch = _df(spark, 20, 23)
    _inject_winner(
        monkeypatch,
        lambda: delta_log.append(batch, table, txn=("sink-app", 7)),
    )
    v = delta_log.append(batch, table, txn=("sink-app", 7))
    assert v == 1  # the winner's version — not a new commit
    assert delta_log.latest_version(table) == 1
    assert _ids(spark, table) == list(range(5)) + [20, 21, 22]  # ONE copy
    assert delta_log.last_txn_version(table, "sink-app") == 7


def test_many_writers_all_appends_land(spark, table):
    """Real interleaving: N threads appending concurrently through the
    public API — every append lands exactly once, versions are
    contiguous, and both readers replay the union."""
    delta_log.create(_df(spark, 0, 1), table)
    n = 6
    errs: list = []
    barrier = threading.Barrier(n)

    def writer(k):
        try:
            barrier.wait(30)
            delta_log.append(
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
    assert delta_log.latest_version(table) == n
    want = [0] + sorted(
        x for k in range(n) for x in range(1000 * (k + 1), 1000 * (k + 1) + 3)
    )
    assert _ids(spark, table) == want
    from tests import delta_reader_independent as clean

    assert sorted(r[0] for r in clean.read_rows(table)) == want
