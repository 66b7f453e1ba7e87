"""Round-8 lake-layer features: equality-delete (upsert) commits
through the STREAMING Iceberg CDC source — each commit's dead rows
recovered against its own parent snapshot, matching the batch
`iceberg.table_changes` feed row-for-row and driving the same
exactly-once IVM refresh loop the position-delete histories do."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import iceberg


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_iceberg_cdc_stream_upsert_history(spark, table, tmp_path):
    """Two chained upserts (equality delete + append each) stream as
    delete(old) + insert(new); the second commit's recovery must see
    the FIRST commit's effect (its parent state), never re-emit
    already-dead rows, and the streamed feed must equal the batch
    change feed row-for-row."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    iceberg.create(
        spark.createDataFrame(
            [(i, str(i % 3), float(i)) for i in range(12)],
            "id long, cat string, val double",
        ),
        table,
        partition_by=["cat"],  # identity fills must restore on deletes
    )
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink = str(tmp_path / "up_sink")
    ckpt = str(tmp_path / "up_ckpt")

    def drain():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", table).load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(sink).count() == 12

    # upsert 1: rewrite ids 3 and 7, add id 100 (seq 2 = eq-delete,
    # seq 3 = append)
    iceberg.upsert(
        spark,
        table,
        spark.createDataFrame(
            [(3, "9", 33.0), (7, "9", 77.0), (100, "9", 1.0)],
            "id long, cat string, val double",
        ),
        keys=["id"],
    )
    # upsert 2: rewrite id 3 AGAIN plus id 11 — its parent state must
    # include upsert 1's effect (kills (3,'9',33.0), not (3,'0',3.0))
    iceberg.upsert(
        spark,
        table,
        spark.createDataFrame(
            [(3, "8", 333.0), (11, "8", 111.0)],
            "id long, cat string, val double",
        ),
        keys=["id"],
    )
    drain()
    rows = spark.read.parquet(sink).collect()
    streamed = Counter(
        (r.id, r.cat, r.val, r._change_type) for r in rows
    ) - Counter(
        # drain 1's base-load inserts: the upsert delta is the rest
        (i, str(i % 3), float(i), "insert") for i in range(12)
    )
    batch = Counter(
        (r.id, r.cat, r.val, r._change_type)
        for r in iceberg.table_changes(
            spark, table, 1, include_deletes=True
        ).collect()
    )
    assert streamed == batch  # row-for-row parity with the batch feed

    dels = Counter(
        (r.id, r.cat, r.val) for r in rows if r._change_type == "delete"
    )
    assert dels == Counter(
        {
            (3, "0", 3.0): 1,     # killed by upsert 1
            (7, "1", 7.0): 1,     # killed by upsert 1
            (3, "9", 33.0): 1,    # upsert 1's row, killed by upsert 2
            (11, "2", 11.0): 1,   # killed by upsert 2
        }
    )
    # folding the signed stream reproduces the head snapshot
    state = Counter()
    for r in rows:
        state[(r.id, r.cat, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        (r.id, r.cat, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head


def test_iceberg_cdc_stream_upsert_drives_ivm_refresh_exactly_once(
    spark, table, tmp_path
):
    """The exactly-once IVM loop through an UPSERT (equality-delete)
    history on the streaming source: base load, then upsert + append,
    each drained once; the finalized view equals a direct aggregate of
    the head snapshot — old rows retract exactly once."""
    from march_mania_spark_lakehouse_spark.operators import ivm
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    iceberg.create(
        spark.createDataFrame(
            [(i, str(i % 3), float(i)) for i in range(30)],
            "id long, cat string, val double",
        ),
        table,
    )
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    changes_sink = str(tmp_path / "ivm_changes")
    ckpt = str(tmp_path / "ivm_ckpt")
    state_dir = str(tmp_path / "ivm_state")

    def refresh():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", table).load()
            .writeStream.format("parquet")
            .option("path", changes_sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        changes = spark.read.parquet(changes_sink)
        state = ivm.signed_state(changes, ["cat"], "val")
        state.write.mode("overwrite").parquet(state_dir)

    refresh()
    iceberg.upsert(
        spark,
        table,
        spark.createDataFrame(
            [(5, "0", 500.0), (6, "1", 600.0), (99, "2", 999.0)],
            "id long, cat string, val double",
        ),
        keys=["id"],
    )
    iceberg.append(
        spark.createDataFrame(
            [(40, "1", 40.0)], "id long, cat string, val double"
        ),
        table,
    )
    refresh()

    view = {
        r["cat"]: (r["n_rows"], round(r["sum_m"], 6))
        for r in ivm.finalize_counts(spark.read.parquet(state_dir)).collect()
    }
    direct = {
        r["cat"]: (r["n"], round(r["s"], 6))
        for r in iceberg.read_iceberg(spark, table)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert view == direct


def test_delta_update_history_reads_as_cdf_pairs(spark, table):
    """`table_changes_cdf`: an update_where history reads back as
    update_preimage/update_postimage pairs stamped with the pair's
    final version; plain appends/deletes keep insert/delete with their
    own versions; and folding the CDF over the starting snapshot
    reproduces the head."""
    from collections import Counter

    from march_mania_spark_lakehouse_spark.sources import delta_log

    delta_log.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(12)], "id long, val double"
        ),
        table,
    )
    delta_log.append(
        spark.createDataFrame([(20, 20.0), (21, 21.0)], "id long, val double"),
        table,
    )  # v1
    delta_log.update_where(
        spark, table, "id % 4 = 0", {"val": F.col("val") * 10}
    )  # v2 (delete) + v3 (write)
    delta_log.delete_where(spark, table, "id = 1")  # v4
    cdf = delta_log.table_changes_cdf(spark, table, 0).collect()

    by_type = Counter(r._change_type for r in cdf)
    upd_ids = sorted(i for i in list(range(12)) + [20, 21] if i % 4 == 0)
    assert by_type == Counter(
        insert=2,
        update_preimage=len(upd_ids),
        update_postimage=len(upd_ids),
        delete=1,
    )
    pre = {(r.id, r.val) for r in cdf if r._change_type == "update_preimage"}
    post = {(r.id, r.val) for r in cdf if r._change_type == "update_postimage"}
    assert pre == {(i, float(i)) for i in upd_ids}
    assert post == {(i, float(i) * 10) for i in upd_ids}
    # pre AND post carry the pair's final (append) version
    assert {
        r._commit_version for r in cdf
        if r._change_type.startswith("update_")
    } == {3}
    assert {r._commit_version for r in cdf if r._change_type == "insert"} == {1}
    assert {r._commit_version for r in cdf if r._change_type == "delete"} == {4}
    # fold: start snapshot + inserts + postimages - deletes - preimages
    state = Counter(
        (r.id, r.val)
        for r in delta_log.read_delta(spark, table, 0).collect()
    )
    for r in cdf:
        sign = 1 if r._change_type in ("insert", "update_postimage") else -1
        state[(r.id, r.val)] += sign
    head = Counter(
        (r.id, r.val) for r in delta_log.read_delta(spark, table).collect()
    )
    assert +state == head


def test_cdf_orphaned_update_delete_half_degrades_to_deletes(spark, table):
    """A crash between update_where's two commits leaves a tagged
    delete half with no write twin — the CDF reader must surface its
    rows as plain deletes, never as unpaired preimages."""
    from march_mania_spark_lakehouse_spark.sources import delta_log

    delta_log.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, val double"
        ),
        table,
    )
    # simulate the orphan: a tagged delete commit, twin never lands
    delta_log.delete_where(
        spark, table, "id >= 4",
        _op=("UPDATE", {"updateId": "deadbeef", "phase": "delete",
                        "predicate": "id >= 4"}),
    )
    cdf = delta_log.table_changes_cdf(spark, table, 0).collect()
    assert {r._change_type for r in cdf} == {"delete"}
    assert sorted(r.id for r in cdf) == [4, 5]


def test_widen_int_partition_column_cross_boundary_pruning(spark, table):
    """int → long widening on a PARTITION column (gate lifted, round
    8): partitionValues strings are canonical decimals, so pruning
    stays consistent across the boundary — generation A (narrow) and
    generation B (wide, including a value beyond int range) both
    resolve through one scan_partitions call and the full scan."""
    from march_mania_spark_lakehouse_spark.sources import delta_log

    delta_log.create(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(12)],
            "id long, k int, val double",
        ),
        table,
        partition_by=["k"],
    )
    delta_log.widen_column(table, "k", "long")
    assert dict(delta_log.read_delta(spark, table).dtypes)["k"] == "bigint"
    delta_log.append(
        spark.createDataFrame(
            [(100, 1, 100.0), (101, 3_000_000_000, 101.0)],
            "id long, k long, val double",
        ),
        table,
    )
    got = delta_log.scan_partitions(spark, table, {"k": 1})
    assert sorted(r.id for r in got.collect()) == [1, 4, 7, 10, 100]
    wide = delta_log.scan_partitions(spark, table, {"k": 3_000_000_000})
    assert [r.id for r in wide.collect()] == [101]
    full = delta_log.read_delta(spark, table)
    assert full.filter(F.col("k") == 1).count() == 5
    assert {r.k for r in full.collect()} == {0, 1, 2, 3_000_000_000}


def test_widen_float_partition_column_rewrites_partition_values(
    spark, table
):
    """float → double widening on a PARTITION column: the widen commit
    rewrites each live add's partitionValues to the EXACT upcast
    double rendering and flips restoration to the log values (hive dir
    strings keep the narrow rendering). Values must equal the
    value-preserving upcast — cast('0.1' as float) upcasts to
    0.10000000149…, never the double 0.1 — and pruning must match both
    old and new generations."""
    import struct as _struct

    from march_mania_spark_lakehouse_spark.sources import delta_log

    up = lambda s: _struct.unpack("<f", _struct.pack("<f", float(s)))[0]
    delta_log.create(
        spark.createDataFrame(
            # 0.0001 renders SCIENTIFICALLY in hive dirs ("1.0E-4") but
            # as plain decimal in Python repr — partition matching must
            # be numeric, not string (round-8 review finding)
            [(1, 0.1, "a"), (2, 1.5, "b"), (3, 0.1, "c"), (5, 0.0001, "e")],
            "id long, p float, s string",
        ),
        table,
        partition_by=["p"],
    )
    pre = delta_log.scan_partitions(spark, table, {"p": up("0.0001")})
    assert [r.id for r in pre.collect()] == [5]
    before = {(r.id, r.p) for r in delta_log.read_delta(spark, table).collect()}
    delta_log.widen_column(table, "p", "double")
    got = {(r.id, r.p) for r in delta_log.read_delta(spark, table).collect()}
    # exact value-preserving upcast of every narrow value
    assert got == {(i, up(p)) for i, p in before}
    assert (1, 0.1) not in got  # the double 0.1 would be WRONG
    # new wide-typed generation shares the partition grid — including
    # the value whose JVM dir rendering is scientific ("9.99…E-5")
    delta_log.append(
        spark.createDataFrame(
            [(4, up("0.1"), "d"), (6, up("0.0001"), "f")],
            "id long, p double, s string",
        ),
        table,
    )
    pruned = delta_log.scan_partitions(spark, table, {"p": up("0.1")})
    assert sorted(r.id for r in pruned.collect()) == [1, 3, 4]
    sci = delta_log.scan_partitions(spark, table, {"p": up("0.0001")})
    assert sorted(r.id for r in sci.collect()) == [5, 6]
    # pruning really pruned: the 1.5 partition's file is not planned
    assert len(pruned.inputFiles()) < len(
        delta_log.read_delta(spark, table).inputFiles()
    )
    # the independent clean-room reader (log-values restoration by
    # construction) agrees with the engine on every row
    import tests.delta_reader_independent as indep

    assert {
        (t[0], t[1]) for t in indep.read_rows(table)
    } == {(i, p) for i, p in got} | {(4, up("0.1")), (6, up("0.0001"))}


def test_clone_single_commit_table_bootstraps_change_feed(spark, tmp_path):
    """Finding from the round-8 review: a clone of a single-commit
    table carries status-0 entries at seq 1, and the change feeds must
    emit them (previously the status!=1 filter silently returned an
    EMPTY feed for a populated clone). Multi-seq clones refuse the
    pre-clone range with the expired-history error — the stated trade."""
    src = str(tmp_path / "src")
    iceberg.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "id long, v double"
        ),
        src,
    )
    c1 = str(tmp_path / "c1")
    iceberg.clone(src, c1)
    feed = iceberg.table_changes(spark, c1, 0, include_deletes=True)
    got = sorted(r.id for r in feed.collect())
    assert got == list(range(8))
    assert {r._change_type for r in feed.collect()} == {"insert"}
    # multi-sequence source: pre-clone range refuses (epoch = clone)
    iceberg.append(
        spark.createDataFrame([(100, 1.0)], "id long, v double"), src
    )
    c2 = str(tmp_path / "c2")
    iceberg.clone(src, c2)
    with pytest.raises(iceberg.IcebergNonAppendChangeError, match="expired"):
        iceberg.table_changes(spark, c2, 0).count()
    # but post-clone commits stream fine from the clone point
    iceberg.append(
        spark.createDataFrame([(200, 2.0)], "id long, v double"), c2
    )
    tail = iceberg.table_changes(
        spark, c2, iceberg.current_metadata(c2)["last-sequence-number"] - 1
    )
    assert [r.id for r in tail.collect()] == [200]


def test_explicit_cdf_files_match_derived_feed(spark, table):
    """delta.enableChangeDataFeed: DELETE persists its dead rows and
    UPDATE its pre/post images as explicit _change_data files with cdc
    actions; table_changes_cdf reads them verbatim and the result must
    equal the DERIVED feed of an identical table without the flag —
    same rows, same labels, same versions."""
    from collections import Counter

    from march_mania_spark_lakehouse_spark.sources import delta_log

    def build(t, cdf):
        conf = {"delta.enableChangeDataFeed": "true"} if cdf else None
        delta_log.create(
            spark.createDataFrame(
                [(i, float(i)) for i in range(16)], "id long, val double"
            ),
            t,
            configuration=conf,
        )
        delta_log.append(
            spark.createDataFrame([(30, 30.0)], "id long, val double"), t
        )
        delta_log.update_where(
            spark, t, "id % 5 = 0", {"val": F.col("val") * 100}
        )
        delta_log.delete_where(spark, t, "id = 3")
        return Counter(
            tuple(r)
            for r in delta_log.table_changes_cdf(spark, t, 0).collect()
        )

    import os

    explicit = build(table, cdf=True)
    derived = build(table + "_plain", cdf=False)
    assert explicit == derived
    # the explicit table REALLY used change files
    cdc_files = os.listdir(os.path.join(table, "_change_data"))
    assert len(cdc_files) >= 3  # preimage + postimage + delete
    log_actions = []
    for v in range(delta_log.latest_version(table) + 1):
        log_actions += delta_log._read_actions(
            delta_log._commit_path(table, v)
        )
    assert sum(1 for a in log_actions if "cdc" in a) >= 3
    # vacuum never reclaims _change_data (underscore dir rule)
    delta_log.vacuum(table, retention_ms=0)
    assert os.listdir(os.path.join(table, "_change_data"))


def test_explicit_cdf_survives_rename(spark, table):
    """Change files store PHYSICAL column names, so a rename between
    the change and the read resolves through the mapping like data
    files do."""
    from march_mania_spark_lakehouse_spark.sources import delta_log

    delta_log.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "id long, val double"
        ),
        table,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delta_log.enable_column_mapping(table)
    delta_log.update_where(spark, table, "id = 2", {"val": F.lit(999.0)})
    delta_log.rename_column(table, "val", "metric")
    cdf = delta_log.table_changes_cdf(spark, table, 0).collect()
    assert "metric" in cdf[0].asDict()
    post = [r for r in cdf if r._change_type == "update_postimage"]
    assert [(r.id, r.metric) for r in post] == [(2, 999.0)]


def test_streaming_delta_cdc_reads_explicit_cdf_files(spark, table, tmp_path):
    """The streaming Delta CDC source on a CDF-enabled table: commits
    carrying cdc actions feed from the explicit change files alone
    (update_preimage/update_postimage labels intact, no double-emit of
    the postimage adds), and the signed fold still reproduces the
    head."""
    from collections import Counter

    from march_mania_spark_lakehouse_spark.sources import delta_log
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        DeltaTableCdcStreamDataSource,
    )

    delta_log.create(
        spark.createDataFrame(
            [(i, str(i % 2), float(i)) for i in range(10)],
            "id long, g string, val double",
        ),
        table,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    spark.dataSource.register(DeltaTableCdcStreamDataSource)
    sink = str(tmp_path / "cdf_sink")
    ckpt = str(tmp_path / "cdf_ckpt")

    def drain():
        q = (
            spark.readStream.format("delta_table_cdc")
            .option("path", table).load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    delta_log.update_where(spark, table, "id % 3 = 0", {"val": F.lit(-1.0)})
    delta_log.delete_where(spark, table, "id = 1")
    drain()
    rows = spark.read.parquet(sink).collect()
    by_type = Counter(r._change_type for r in rows)
    upd = [i for i in range(10) if i % 3 == 0]
    assert by_type == Counter(
        insert=10,
        update_preimage=len(upd),
        update_postimage=len(upd),
        delete=1,
    )
    post = {(r.id, r.g, r.val) for r in rows
            if r._change_type == "update_postimage"}
    assert post == {(i, str(i % 2), -1.0) for i in upd}
    state = Counter()
    for r in rows:
        sign = 1 if r._change_type in ("insert", "update_postimage") else -1
        state[(r.id, r.g, r.val)] += sign
    head = Counter(
        (r.id, r.g, r.val)
        for r in delta_log.read_delta(spark, table).collect()
    )
    assert +state == head


def test_iceberg_upsert_history_reads_as_cdf_pairs(spark, table):
    """Iceberg `table_changes_cdf` (the Delta symmetry): an upsert
    history reads back as update_preimage/update_postimage pairs
    stamped with the pair's final sequence; appends and plain deletes
    keep insert/delete with their own sequence; folding over the first
    snapshot reproduces the head; an orphaned delete half degrades to
    plain deletes."""
    iceberg.create(
        spark.createDataFrame(
            [(i, str(i % 3), float(i)) for i in range(10)],
            "id long, cat string, val double",
        ),
        table,
    )
    iceberg.append(
        spark.createDataFrame(
            [(20, "z", 20.0)], "id long, cat string, val double"
        ),
        table,
    )  # seq 2
    iceberg.upsert(
        spark,
        table,
        spark.createDataFrame(
            [(3, "9", 33.0), (50, "9", 50.0)],
            "id long, cat string, val double",
        ),
        keys=["id"],
    )  # seq 3 (eq-delete) + seq 4 (append)
    iceberg.delete_where(spark, table, "id = 7")  # seq 5
    cdf = iceberg.table_changes_cdf(spark, table, 1).collect()

    by_type = Counter(r._change_type for r in cdf)
    assert by_type == Counter(
        insert=1, update_preimage=1, update_postimage=2, delete=1
    )
    assert {(r.id, r.cat, r.val) for r in cdf
            if r._change_type == "update_preimage"} == {(3, "0", 3.0)}
    assert {(r.id, r.val) for r in cdf
            if r._change_type == "update_postimage"} == {(3, 33.0), (50, 50.0)}
    assert {
        r._change_ordinal for r in cdf
        if r._change_type.startswith("update_")
    } == {4}
    assert [(r.id, r._change_ordinal) for r in cdf
            if r._change_type == "insert"] == [(20, 2)]
    assert [(r.id, r._change_ordinal) for r in cdf
            if r._change_type == "delete"] == [(7, 5)]
    # fold over the first snapshot reproduces the head
    first = iceberg.snapshot_ids(table)[0]
    state = Counter(
        (r.id, r.cat, r.val)
        for r in iceberg.read_iceberg(spark, table, first).collect()
    )
    for r in cdf:
        sign = 1 if r._change_type in ("insert", "update_postimage") else -1
        state[(r.id, r.cat, r.val)] += sign
    head = Counter(
        (r.id, r.cat, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head
    # orphaned delete half (no append twin): plain deletes
    iceberg.delete_by_equality(
        spark, table, spark.createDataFrame([(5,)], "id long"),
        summary={"upsert-id": "deadbeef", "upsert-keys": "id"},
    )
    tail = iceberg.table_changes_cdf(spark, table, 5).collect()
    assert {r._change_type for r in tail} == {"delete"}
    assert [r.id for r in tail] == [5]


def test_ivm_signed_state_folds_cdf_update_pairs(spark, table, tmp_path):
    """`ivm.signed_state` over a CDF feed WITH update pairs: preimages
    retract, postimages contribute — the finalized view equals a direct
    aggregate of the head snapshot."""
    from march_mania_spark_lakehouse_spark.operators import ivm
    from march_mania_spark_lakehouse_spark.sources import delta_log

    delta_log.create(
        spark.createDataFrame(
            [(i, str(i % 3), float(i)) for i in range(18)],
            "id long, cat string, val double",
        ),
        table,
    )
    delta_log.update_where(spark, table, "id % 4 = 0", {"val": F.lit(7.0)})
    delta_log.delete_where(spark, table, "id = 5")
    cdf = delta_log.table_changes_cdf(spark, table, -1)  # incl. v0 create
    view = {
        r["cat"]: (r["n_rows"], round(r["sum_m"], 6))
        for r in ivm.finalize_counts(
            ivm.signed_state(cdf, ["cat"], "val")
        ).collect()
    }
    direct = {
        r["cat"]: (r["n"], round(r["s"], 6))
        for r in delta_log.read_delta(spark, table)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert view == direct
