"""Delta-transaction-log publisher (`sources/delta_log.py`).

No Delta reader ships in this container (no connector jars / network),
so conformance is checked structurally against the public protocol:
action schemas, %020d commit naming, replay semantics (adds minus
removes), checkpoint + _last_checkpoint equivalence, put-if-absent
commits, stats-based pruning parity, and retention-gated vacuum.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.sources import delta_log


def _orders(spark, sf_dir):
    return catalog.load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "delta_orders")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_create_append_overwrite_time_travel(spark, sf_dir, table):
    orders = _orders(spark, sf_dir)
    lo = orders.filter(F.col("o_orderkey") % 3 == 0)
    mid = orders.filter(F.col("o_orderkey") % 3 == 1)
    new = orders.filter(F.col("o_orderkey") % 3 == 2)

    v0 = delta_log.create(lo, table, stat_cols=["o_orderkey"])
    v1 = delta_log.append(mid, table, stat_cols=["o_orderkey"])
    v2 = delta_log.overwrite(new, table, stat_cols=["o_orderkey"])
    assert (v0, v1, v2) == (0, 1, 2)

    assert _rows(delta_log.read_delta(spark, table, 0)) == _rows(lo)
    assert _rows(delta_log.read_delta(spark, table, 1)) == _rows(lo.unionByName(mid))
    assert _rows(delta_log.read_delta(spark, table)) == _rows(new)  # latest


def test_log_layout_and_required_action_fields(spark, sf_dir, table):
    delta_log.create(_orders(spark, sf_dir), table, stat_cols=["o_orderkey"])
    log_dir = os.path.join(table, "_delta_log")
    names = sorted(os.listdir(log_dir))
    assert names == ["00000000000000000000.json"]  # %020d naming

    actions = delta_log._read_actions(os.path.join(log_dir, names[0]))
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds

    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}

    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == []
    # schemaString is Spark StructType JSON — parseable, field names intact
    schema = json.loads(meta["schemaString"])
    assert {f["name"] for f in schema["fields"]} >= {"o_orderkey", "o_totalprice"}

    for a in actions:
        if "add" in a:
            add = a["add"]
            assert add["path"].endswith(".parquet") and "/" not in add["path"]
            assert add["dataChange"] is True and add["size"] > 0
            stats = json.loads(add["stats"])
            assert stats["numRecords"] > 0
            assert "o_orderkey" in stats["minValues"]
            assert stats["minValues"]["o_orderkey"] <= stats["maxValues"]["o_orderkey"]
            # data file really exists in the table root
            assert os.path.exists(os.path.join(table, add["path"]))


def test_concurrent_commit_single_winner(spark, sf_dir, table):
    delta_log.create(_orders(spark, sf_dir), table)
    with pytest.raises(delta_log.DeltaConcurrentCommitError):
        delta_log._write_commit(table, 0, [{"commitInfo": {"timestamp": 0}}])
    # and the original commit content is untouched
    assert delta_log.latest_version(table) == 0
    assert len(delta_log.snapshot_files(table)) > 0


def test_checkpoint_replay_equivalence(spark, sf_dir, table):
    orders = _orders(spark, sf_dir)
    delta_log.create(orders.filter("o_orderkey % 2 = 0"), table)
    delta_log.append(orders.filter("o_orderkey % 4 = 1"), table)
    before = delta_log.snapshot_files(table)

    cp_v = delta_log.checkpoint(table)
    assert cp_v == 1
    assert os.path.exists(
        os.path.join(table, "_delta_log", f"{cp_v:020d}.checkpoint.parquet")
    )
    with open(os.path.join(table, "_delta_log", "_last_checkpoint")) as f:
        lc = json.load(f)
    assert lc["version"] == cp_v

    # replay from checkpoint must equal pure-JSON replay
    assert delta_log.snapshot_files(table) == before

    # a commit after the checkpoint lands on top of it
    delta_log.append(orders.filter("o_orderkey % 4 = 3"), table)
    expect = orders.filter("o_orderkey % 2 = 0 OR o_orderkey % 2 = 1")
    assert _rows(delta_log.read_delta(spark, table)) == _rows(expect)


def test_stats_pruning_parity_and_file_skipping(spark, sf_dir, table):
    orders = _orders(spark, sf_dir).orderBy("o_orderkey").repartitionByRange(
        4, "o_orderkey"
    )
    delta_log.create(orders, table, stat_cols=["o_orderkey"])
    assert len(delta_log.snapshot_files(table)) == 4

    lo, hi = 100, 800
    pruned = delta_log.scan_pruned(spark, table, "o_orderkey", lo, hi)
    full = delta_log.read_delta(spark, table).filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi)
    )
    assert _rows(pruned) == _rows(full)

    # narrow range: planner must open fewer files than the table holds
    kept = [
        p
        for p, add in delta_log._replay(table, 0).items()
        if (lambda s: s["minValues"]["o_orderkey"] <= hi
            and s["maxValues"]["o_orderkey"] >= lo)(json.loads(add["stats"]))
    ]
    assert len(kept) < 4


def test_vacuum_respects_retention_then_deletes(spark, sf_dir, table):
    orders = _orders(spark, sf_dir)
    delta_log.create(orders.limit(50), table)
    old_files = set(delta_log.snapshot_files(table))
    delta_log.overwrite(orders.limit(20), table)

    # default 7-day retention: tombstoned-but-recent files survive
    assert delta_log.vacuum(table) == []
    for f in old_files:
        assert os.path.exists(os.path.join(table, f))

    # retention 0: tombstoned files go; live snapshot unaffected
    deleted = delta_log.vacuum(table, retention_ms=0)
    assert set(deleted) == old_files
    for f in old_files:
        assert not os.path.exists(os.path.join(table, f))
    assert delta_log.read_delta(spark, table).count() == 20


def test_merge_into_delta_table(spark, sf_dir, table):
    """MERGE commit: updates win on key, inserts land, deletes vanish —
    and the pre-merge snapshot stays time-travelable."""
    orders = _orders(spark, sf_dir).limit(100)
    delta_log.create(orders, table, stat_cols=["o_orderkey"])

    keys = [r["o_orderkey"] for r in orders.select("o_orderkey").collect()]
    upd_key, del_key, ins_key = keys[0], keys[1], max(keys) + 999
    changes = spark.createDataFrame(
        [
            (upd_key, 0, 123.45, "U", False),
            (del_key, 0, 0.0, "X", True),
            (ins_key, 7, 9.99, "N", False),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string, deleted boolean",
    )
    v = delta_log.merge(changes, table, keys=["o_orderkey"], delete_col="deleted")
    assert v == 1

    got = {
        r["o_orderkey"]: (r["o_totalprice"], r["o_orderstatus"])
        for r in delta_log.read_delta(spark, table).collect()
    }
    assert got[upd_key] == (123.45, "U")  # matched -> update
    assert del_key not in got  # matched + flag -> delete
    assert got[ins_key] == (9.99, "N")  # unmatched -> insert
    assert len(got) == 100  # 100 - 1 delete + 1 insert
    # commitInfo records the operation; v0 still reconstructs
    actions = delta_log._read_actions(
        os.path.join(table, "_delta_log", f"{v:020d}.json")
    )
    assert actions[0]["commitInfo"]["operation"] == "MERGE"
    assert delta_log.read_delta(spark, table, version=0).count() == 100


def test_create_refuses_existing_log(spark, sf_dir, table):
    delta_log.create(_orders(spark, sf_dir).limit(5), table)
    with pytest.raises(FileExistsError):
        delta_log.create(_orders(spark, sf_dir).limit(5), table)


def test_streaming_delta_sink_exactly_once_txn(spark, sf_dir, table, tmp_path):
    """Streaming append into the Delta log with SetTransaction
    idempotence: a drained stream, a restart with more data, and a
    simulated batch replay must leave every row exactly once and the
    txn watermark at the last batch id."""
    from march_mania_spark_lakehouse_spark.streaming import sinks

    events = catalog.load(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    ).limit(300)
    src = str(tmp_path / "dsink_src")
    ckpt = str(tmp_path / "dsink_ckpt")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = sinks.start_delta_append_sink(stream, table, ckpt, app_id="t-app")
        q.awaitTermination(120)

    run()
    assert delta_log.read_delta(spark, table).count() == first.count()
    v_after_first = delta_log.latest_version(table)

    second.coalesce(1).write.mode("append").parquet(src)
    run()  # restart from checkpoint: only the new file becomes batch 1
    got = delta_log.read_delta(spark, table)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()

    # simulated crash-replay of batch 1: the txn check must no-op it
    from march_mania_spark_lakehouse_spark.sources.delta_log import last_txn_version

    assert last_txn_version(table, "t-app") == 1
    before = delta_log.latest_version(table)
    batch_df = spark.read.parquet(src)

    def replay(batch_id):
        if batch_id <= last_txn_version(table, "t-app"):
            return
        delta_log.append(batch_df, table, txn=("t-app", batch_id))

    replay(1)  # same id → skipped
    assert delta_log.latest_version(table) == before
    assert delta_log.read_delta(spark, table).count() == events.count()
    assert v_after_first < before


def test_schema_enforcement_and_evolution(spark, sf_dir, table):
    """Delta schema semantics: extra columns are rejected without
    merge_schema; with it, metaData evolves and old files read the new
    column as null — while the pre-evolution snapshot keeps the old
    schema."""
    orders = _orders(spark, sf_dir).limit(40)
    delta_log.create(orders, table)

    widened = orders.limit(10).withColumn("o_channel", F.lit("web"))
    with pytest.raises(delta_log.DeltaSchemaMismatchError):
        delta_log.append(widened, table)

    v = delta_log.append(widened, table, merge_schema=True)
    got = delta_log.read_delta(spark, table, v)
    assert "o_channel" in got.columns
    by_channel = {r["o_channel"]: r["n"] for r in
                  got.groupBy("o_channel").agg(F.count("*").alias("n")).collect()}
    assert by_channel == {"web": 10, None: 40}  # old files -> null
    # time travel to v0 keeps the pre-evolution schema
    assert "o_channel" not in delta_log.read_delta(spark, table, 0).columns
    # missing-column appends still work post-evolution (null-filled)
    delta_log.append(orders.limit(5), table)
    assert delta_log.read_delta(spark, table).count() == 55


def test_partitioned_table_round_trip_and_log_pruning(spark, sf_dir, table):
    """Hive-partitioned Delta table: partitionValues ride in the add
    actions, reads restore the partition column with its declared type,
    appends inherit the partitioning, and scan_partitions plans ONLY
    the matching partition's files from the log."""
    orders = _orders(spark, sf_dir).limit(200)
    delta_log.create(
        orders, table, stat_cols=["o_orderkey"], partition_by=["o_orderstatus"]
    )
    assert delta_log.table_partition_columns(table) == ["o_orderstatus"]

    # add actions carry the partition value; files live under col=val/
    for path, add in delta_log._replay(table, 0).items():
        assert add["partitionValues"].get("o_orderstatus") in {"O", "F", "P"}
        assert path.startswith("o_orderstatus=")

    got = delta_log.read_delta(spark, table)
    assert _rows(got.select(*orders.columns)) == _rows(orders)
    assert dict(got.dtypes)["o_orderstatus"] == "string"

    # append inherits partitioning
    extra = orders.limit(30).withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    delta_log.append(extra, table)
    assert delta_log.read_delta(spark, table).count() == 230

    # log-planned partition pruning == filter, with fewer files
    pruned = delta_log.scan_partitions(spark, table, {"o_orderstatus": "F"})
    full = delta_log.read_delta(spark, table).filter(F.col("o_orderstatus") == "F")
    assert _rows(pruned.select(*orders.columns)) == _rows(full.select(*orders.columns))
    n_live = len(delta_log.snapshot_files(table))
    n_kept = len([
        p for p, a in delta_log._replay(table, delta_log.latest_version(table)).items()
        if a["partitionValues"].get("o_orderstatus") == "F"
    ])
    assert 0 < n_kept < n_live


def test_write_audit_publish_gates_bad_batches(spark, sf_dir, table):
    """WAP: a batch violating its expectations must leave the table's
    visible state AND version untouched (staged files deleted), while a
    clean batch publishes normally with audited=true in commitInfo."""
    orders = _orders(spark, sf_dir).limit(100)
    delta_log.create(orders, table)
    v0_files = set(delta_log.snapshot_files(table))

    bad = spark.createDataFrame(
        [(1, 2, -5.0, "X"), (2, 3, 10.0, "F")],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    checks = {
        "nonneg_price": F.col("o_totalprice") < 0,
        "known_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
    }
    with pytest.raises(delta_log.DeltaAuditError) as exc:
        delta_log.write_audit_publish(bad, table, checks)
    assert exc.value.violations == {"nonneg_price": 1, "known_status": 1}
    assert delta_log.latest_version(table) == 0  # nothing published
    assert set(delta_log.snapshot_files(table)) == v0_files
    assert delta_log.read_delta(spark, table).count() == 100
    # staged files physically removed — no orphan debris for vacuum
    data_files = [f for f in os.listdir(table)
                  if f.endswith(".parquet") and not f.startswith(("_", "."))]
    assert set(data_files) == v0_files

    good = spark.createDataFrame(
        [(900001, 3, 10.0, "F")],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    v = delta_log.write_audit_publish(good, table, checks)
    assert v == 1
    assert delta_log.read_delta(spark, table).count() == 101
    info = delta_log._read_actions(
        os.path.join(table, "_delta_log", f"{v:020d}.json")
    )[0]["commitInfo"]
    assert info["operationParameters"]["audited"] == "true"


def test_optimize_compacts_and_zorder_tightens_stats(spark, sf_dir, table):
    """OPTIMIZE: many small files collapse to the bin-packed count with
    identical rows and a still-readable pre-optimize version; z-order
    clustering must make per-file [min,max] boxes on the clustered
    column strictly tighter than the scattered layout, so scan_pruned
    opens fewer files for the same range."""
    orders = _orders(spark, sf_dir).withColumn(
        "o_key2", (F.col("o_orderkey") * 7919) % 1000
    )
    # scattered layout: 8 files, each spanning ~the whole key range
    delta_log.create(
        orders.repartition(8), table, stat_cols=["o_orderkey", "o_key2"]
    )
    before_files = delta_log.snapshot_files(table)
    assert len(before_files) == 8

    def files_overlapping(version, lo, hi):
        n = 0
        for _, add in delta_log._replay(table, version).items():
            st = json.loads(add["stats"])
            if st["minValues"]["o_orderkey"] <= hi and st["maxValues"]["o_orderkey"] >= lo:
                n += 1
        return n

    v0_hits = files_overlapping(0, 100, 200)
    assert v0_hits == 8  # every scattered file overlaps any range

    v = delta_log.optimize(
        spark, table, target_file_bytes=16 * 1024,
        zorder_by=["o_orderkey", "o_key2"],
    )
    after_files = delta_log.snapshot_files(table)
    assert set(after_files).isdisjoint(before_files)  # full rewrite
    assert 1 < len(after_files) < 16

    # identical rows, before and after; old version still time-travels
    assert _rows(delta_log.read_delta(spark, table, v).select(*orders.columns)) == _rows(orders)
    assert len(delta_log.snapshot_files(table, 0)) == 8

    # clustering payoff: same range now overlaps a strict minority
    v1_hits = files_overlapping(v, 100, 200)
    assert v1_hits < len(after_files)
    pruned = delta_log.scan_pruned(spark, table, "o_orderkey", 100, 200)
    full = delta_log.read_delta(spark, table).filter(
        F.col("o_orderkey").between(100, 200)
    )
    assert _rows(pruned.select(*orders.columns)) == _rows(full.select(*orders.columns))

    # OPTIMIZE is dataChange=false on both sides of the rewrite
    acts = delta_log._read_actions(
        os.path.join(table, "_delta_log", f"{v:020d}.json")
    )
    assert all(a["add"]["dataChange"] is False for a in acts if "add" in a)
    assert all(a["remove"]["dataChange"] is False for a in acts if "remove" in a)


def test_restore_commits_forward_and_keeps_history(spark, sf_dir, table):
    """RESTORE re-surfaces an old snapshot as a NEW version: rows equal
    the target snapshot, intermediate versions stay time-travelable,
    and restoring a vacuumed version fails loudly before touching the
    log."""
    orders = _orders(spark, sf_dir)
    a = orders.filter("o_orderkey % 3 = 0")
    b = orders.filter("o_orderkey % 3 = 1")
    delta_log.create(a, table)
    delta_log.overwrite(b, table)

    v = delta_log.restore(table, 0)
    assert v == 2
    assert _rows(delta_log.read_delta(spark, table)) == _rows(a)
    # the overwritten middle version is still there
    assert _rows(delta_log.read_delta(spark, table, 1)) == _rows(b)
    acts = delta_log._read_actions(
        os.path.join(table, "_delta_log", f"{v:020d}.json")
    )
    assert acts[0]["commitInfo"]["operation"] == "RESTORE"

    # vacuum away v1's files (not live, retention 0) → RESTORE to v1 raises
    delta_log.vacuum(table, retention_ms=0)
    with pytest.raises(FileNotFoundError):
        delta_log.restore(table, 1)
    assert delta_log.latest_version(table) == v  # log untouched by the failure


def test_table_changes_append_only_cdc_drives_ivm_refresh(spark, sf_dir, table):
    """Change feed: (a) changes between versions are exactly the
    appended rows; (b) OPTIMIZE is invisible to it; (c) rewrite commits
    raise instead of double-counting; (d) feeding the deltas into the
    IVM state merge equals a full recompute — the end-to-end
    incremental-refresh loop on the Delta log."""
    from march_mania_spark_lakehouse_spark.operators import ivm

    orders = _orders(spark, sf_dir)
    a = orders.filter("o_orderkey % 3 = 0")
    b = orders.filter("o_orderkey % 3 = 1")
    c = orders.filter("o_orderkey % 3 = 2")
    delta_log.create(a, table)
    delta_log.append(b, table)
    delta_log.append(c, table)

    # (a) exact appended rows, per range
    assert _rows(delta_log.table_changes(spark, table, 0, 1)) == _rows(b)
    assert _rows(delta_log.table_changes(spark, table, 0)) == _rows(b.unionByName(c))
    assert delta_log.table_changes(spark, table, 2).count() == 0

    # (d) IVM: state(base at v0) + state(changes since v0) == full recompute
    keys = ["o_orderstatus"]
    base_state = ivm.agg_state(delta_log.read_delta(spark, table, 0), keys, "o_totalprice")
    delta_state = ivm.agg_state(delta_log.table_changes(spark, table, 0), keys, "o_totalprice")
    refreshed = ivm.finalize_state(ivm.merge_states(base_state, delta_state))
    full = ivm.finalize_state(
        ivm.agg_state(delta_log.read_delta(spark, table), keys, "o_totalprice")
    )
    assert _rows(refreshed) == _rows(full)

    # (b) OPTIMIZE (dataChange=false) contributes nothing to the feed
    v_opt = delta_log.optimize(spark, table, target_file_bytes=1 << 20)
    assert delta_log.table_changes(spark, table, v_opt - 1, v_opt).count() == 0

    # (c) a rewrite commit in range raises
    delta_log.overwrite(a.limit(10), table)
    with pytest.raises(delta_log.DeltaNonAppendChangeError):
        delta_log.table_changes(spark, table, 0)


def test_delta_table_stream_source_incremental_batches(spark, sf_dir, table, tmp_path):
    """Streaming FROM the Delta log: a drain picks up the current
    snapshot, an append + re-drain (same checkpoint) delivers ONLY the
    new commit's rows, and nothing duplicates — versions are the
    offsets."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableStreamDataSource,
    )

    orders = _orders(spark, sf_dir)
    a = orders.filter("o_orderkey % 3 = 0")
    b = orders.filter("o_orderkey % 3 = 1")
    delta_log.create(a, table)

    spark.dataSource.register(DeltaTableStreamDataSource)
    sink = str(tmp_path / "dstream_sink")
    ckpt = str(tmp_path / "dstream_ckpt")

    def drain():
        stream = (
            spark.readStream.format("delta_table_stream")
            .option("path", table)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = spark.read.parquet(sink)
    assert _rows(got1.select(*orders.columns)) == _rows(a)

    delta_log.append(b, table)
    drain()  # same checkpoint: only the append lands
    got2 = spark.read.parquet(sink)
    assert got2.count() == a.count() + b.count()
    assert _rows(got2.select(*orders.columns)) == _rows(a.unionByName(b))
