"""Round-11 lake layer: snapshot-diff as a streaming re-bootstrap mode.

With ``starting_sequence='retained'`` on a **v3** table whose CURSOR
snapshot is still retained (tagged through `expire_snapshots` — the
resumable-stream pattern), an expired mid-range no longer degrades to a
full 'bootstrap_insert' state reset: the emitted batch is the exact
lineage DIFF between cursor and head (delete/insert vocabulary),
exactly-once for the consumer. v2 tables and expired cursors keep the
round-10 bootstrap fallback.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from march_mania_spark_lakehouse_spark.sources import iceberg


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(n, lo=0):
    return [(i, i % 3, float(i)) for i in range(lo, lo + n)]


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


def test_iceberg_cdc_retained_emits_lineage_diff_after_expiry(
    spark, table, tmp_path
):
    """Expire-mid-stream restart on a v3 table with the cursor snapshot
    tagged: the resumed batch is the EXACT diff (observed in the batch
    sizes — not a full snapshot), carries no bootstrap_insert reset,
    and the plain signed fold over all batches matches the head."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    iceberg.create(
        _df(spark, _rows(12)).repartitionByRange(2, "id"),
        table,
        format_version=3,
    )
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink = str(tmp_path / "diff_sink")
    ckpt = str(tmp_path / "diff_ckpt")

    def drain():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", table)
            .option("starting_sequence", "retained")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()  # cursor at seq 1 (12 inserts)
    iceberg.create_tag(table, "stream-cursor")  # pin the cursor snapshot
    iceberg.delete_where(spark, table, "id < 4")
    iceberg.update_where(spark, table, "id = 5", {"val": "val + 100.0"})
    iceberg.append(_df(spark, [(200, 2, 3.0)]), table)
    removed = iceberg.expire_snapshots(table, keep_last=1)
    assert removed  # intermediates really expired
    drain()

    rows = _sink_rows(spark, sink)
    # no state reset — the diff speaks the stream's native vocabulary
    assert all(r._change_type in ("insert", "delete") for r in rows)
    second = rows[12:]
    got = Counter((r.id, r.k, r.val, r._change_type) for r in second)
    want = Counter()
    for i in range(4):
        want[(i, i % 3, float(i), "delete")] += 1
    want[(5, 2, 5.0, "delete")] += 1          # update pre-image
    want[(5, 2, 105.0, "insert")] += 1        # update post-image
    want[(200, 2, 3.0, "insert")] += 1
    assert got == want
    # exact size: 7 diff rows, not a 9-row full-snapshot re-emit
    assert len(second) == 7
    # exactly-once: the plain signed fold (no reset handling) == head
    state: Counter = Counter()
    for r in rows:
        state[(r.id, r.k, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        (r.id, r.k, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head


def test_iceberg_cdc_diff_ignores_staged_branch_snapshots(
    spark, table, tmp_path
):
    """A staged branch snapshot between cursor and head must never be
    picked as a diff endpoint (sequence numbers are resolved along the
    MAIN lineage only); when the head sequence belongs to a branch the
    reader degrades to the safe bootstrap, and the fold still matches
    the main head."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    iceberg.create(_df(spark, _rows(8)), table, format_version=3)
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink = str(tmp_path / "br_sink")
    ckpt = str(tmp_path / "br_ckpt")

    def drain():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", table)
            .option("starting_sequence", "retained")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    iceberg.create_tag(table, "cursor")
    iceberg.delete_where(spark, table, "id < 2")
    iceberg.append(_df(spark, [(50, 1, 5.0)]), table)
    # a staged branch append AFTER the main head: its snapshot rides
    # meta["snapshots"] but not the main lineage
    iceberg.create_branch(table, "wip")
    iceberg.append_to_branch(_df(spark, [(999, 0, 9.0)]), table, "wip")
    iceberg.expire_snapshots(table, keep_last=1)
    drain()
    rows = _sink_rows(spark, sink)
    state: Counter = Counter()
    prev_bootstrap = False
    for r in rows:
        if r._change_type == "bootstrap_insert":
            if not prev_bootstrap:
                state = Counter()  # reset at the bootstrap batch
            state[(r.id, r.k, r.val)] += 1
            prev_bootstrap = True
        else:
            state[(r.id, r.k, r.val)] += (
                1 if r._change_type == "insert" else -1
            )
            prev_bootstrap = False
    head = Counter(
        (r.id, r.k, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head
    assert (999, 0, 9.0) not in state  # the branch row never leaked


def test_delta_cdc_retained_emits_lineage_diff_after_cleanup(
    spark, tmp_path
):
    """The Delta twin: checkpointing the CURSOR VERSION keeps the
    stream resumable past log cleanup (old checkpoint parquet survives
    — it is a complete snapshot of its version). The resumed batch is
    the exact row-tracking diff, not a bootstrap reset."""
    from march_mania_spark_lakehouse_spark.sources import delta_log
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    table = str(tmp_path / "dtbl")
    delta_log.create(
        _df(spark, _rows(12)).repartitionByRange(2, "id"),
        table,
        row_tracking=True,
    )
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    sink = str(tmp_path / "ddiff_sink")
    ckpt = str(tmp_path / "ddiff_ckpt")

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
    delta_log.delete_where(spark, table, "id < 4")
    delta_log.update_where(spark, table, "id = 5", {"val": "val + 100.0"})
    delta_log.append(_df(spark, [(200, 2, 3.0)]), table)
    head_v = delta_log.checkpoint(table)
    for v in range(head_v):
        p = delta_log._commit_path(table, v)
        if os.path.exists(p):
            os.utime(p, (1, 1))
    assert delta_log.cleanup_log(table, retention_ms=0)
    drain()

    rows = _sink_rows(spark, sink)
    assert all(r._change_type in ("insert", "delete") for r in rows)
    second = rows[12:]
    got = Counter((r.id, r.k, r.val, r._change_type) for r in second)
    want = Counter()
    for i in range(4):
        want[(i, i % 3, float(i), "delete")] += 1
    want[(5, 2, 5.0, "delete")] += 1
    want[(5, 2, 105.0, "insert")] += 1
    want[(200, 2, 3.0, "insert")] += 1
    assert got == want and len(second) == 7
    state: Counter = Counter()
    for r in rows:
        state[(r.id, r.k, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        (r.id, r.k, r.val)
        for r in delta_log.read_delta(spark, table).collect()
    )
    assert +state == head


def test_iceberg_cdc_retained_falls_back_when_cursor_expired(
    spark, table, tmp_path
):
    """Without the tag the cursor snapshot expires too — the v3 table
    still degrades to the round-10 full-snapshot bootstrap reset."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    iceberg.create(_df(spark, _rows(6)), table, format_version=3)
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink = str(tmp_path / "bs_sink")
    ckpt = str(tmp_path / "bs_ckpt")

    def drain():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", table)
            .option("starting_sequence", "retained")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    iceberg.delete_where(spark, table, "id = 0")
    iceberg.append(_df(spark, [(100, 1, 1.0)]), table)
    iceberg.expire_snapshots(table, keep_last=1)
    drain()
    rows = _sink_rows(spark, sink)
    boot = [r for r in rows if r._change_type == "bootstrap_insert"]
    assert len(boot) == 6  # full current snapshot (5 survivors + 1 new)


def test_rollback_to_snapshot(spark, tmp_path):
    """Manage-snapshots rollback: the head swings back to an ancestor
    (metadata-only), rolled-off snapshots stay time-travelable, row
    ids and sequence numbers stay monotonic across the rollback so a
    follow-up append can never collide, and a non-ancestor target
    (staged branch) raises."""
    t = str(tmp_path / "rb")
    iceberg.create(_df(spark, _rows(6)), t, format_version=3)
    good = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.append(_df(spark, [(100, 0, -1.0), (101, 1, -2.0)]), t)
    bad = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.rollback_to_snapshot(t, good)
    assert sorted(r.id for r in iceberg.read_iceberg(spark, t).collect()) == (
        list(range(6))
    )
    # rolled-off snapshot still time-travels
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, t, bad).collect()
    ) == list(range(6)) + [100, 101]
    # post-rollback append: fresh ids above the rolled-off ones, parent
    # = the rolled-to snapshot; both readers agree
    iceberg.append(_df(spark, [(200, 2, 9.0)]), t)
    from tests import iceberg_reader_independent as indep

    meta = iceberg.current_metadata(t)
    head = meta["snapshots"][-1]
    assert head["parent-snapshot-id"] == good
    lin = {
        r.id: r._row_id for r in iceberg.read_lineage(spark, t).collect()
    }
    assert lin[200] >= 8  # ids of the rolled-off rows stay consumed
    assert sorted(t2[0] for t2 in indep.read_rows(t)) == (
        list(range(6)) + [200]
    )
    # non-ancestor target (a staged branch head) refuses
    iceberg.create_branch(t, "wip")
    iceberg.append_to_branch(_df(spark, [(999, 0, 0.0)]), t, "wip")
    wip = iceberg.current_metadata(t)["refs"]["wip"]["snapshot-id"]
    with pytest.raises(ValueError, match="ancestor"):
        iceberg.rollback_to_snapshot(t, wip)
