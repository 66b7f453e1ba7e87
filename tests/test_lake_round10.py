"""Round-10 lake-layer verification: the Iceberg v3 deletion-vector
surface that shipped in round 9 gets its committed test coverage —
merge-on-read deletes as Puffin ``deletion-vector-v1`` blobs, DV
merge-and-replace (never chaining), UPDATE/MERGE on v3 tables, and CDC
net-state through both the batch ``table_changes`` feed and the
streaming Python data source."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import iceberg
from tests import iceberg_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(n):
    return [(i, i % 5, float(i)) for i in range(n)]


def _spark_rows(spark, table, snapshot_id=None):
    return sorted(
        tuple(r)
        for r in iceberg.read_iceberg(spark, table, snapshot_id).collect()
    )


def _no_position_delete_parquet(table):
    """v3 forbids new position-delete files: every content=1 entry at
    every snapshot must be a PUFFIN DV, never parquet."""
    for sid in iceberg.snapshot_ids(table):
        meta = iceberg.current_metadata(table)
        snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
        from march_mania_spark_lakehouse_spark.sources import avro_ocf

        for m in avro_ocf.read_ocf(snap["manifest-list"]):
            for e in avro_ocf.read_ocf(m["manifest_path"]):
                d = e["data_file"]
                if e["status"] in (0, 1) and d.get("content", 0) == 1:
                    assert (d.get("file_format") or "").upper() == "PUFFIN", (
                        f"snapshot {sid} carries a non-DV position delete: "
                        f"{d['file_path']}"
                    )


def test_v3_dv_delete_merge_and_replace_both_readers(spark, table):
    """Two OVERLAPPING v3 deletes: the second DV for a touched file
    must MERGE the first's positions and REPLACE it — the head snapshot
    holds at most one DV per data file whose bitmap is the union, and
    the engine read and the clean-room independent reader both see
    exactly the surviving rows."""
    df = _df(spark, _rows(100)).repartitionByRange(4, "id")
    iceberg.create(df, table, format_version=3)

    iceberg.delete_where(spark, table, "k = 3")          # 20 rows
    iceberg.delete_where(spark, table, "id < 10")        # 10 rows, 2 shared
    want = sorted(
        (i, i % 5, float(i)) for i in range(100) if i % 5 != 3 and i >= 10
    )
    assert len(want) == 72
    assert _spark_rows(spark, table) == want
    assert sorted(indep.read_rows(table)) == want
    _no_position_delete_parquet(table)

    # spec: one DV per data file per snapshot, never a chain
    head = iceberg.snapshot_dv_entries(table)
    refs = [e["referenced_data_file"] for e in head]
    assert len(refs) == len(set(refs))
    # the union sizes: total dead positions across DVs = 28
    assert sum(e["cardinality"] for e in head) == 28
    # decode each blob: positions are sorted, unique, and the merge
    # really happened (a file touched by both deletes carries BOTH
    # delete generations' positions in its single head DV)
    first = iceberg.snapshot_dv_entries(
        table, iceberg.snapshot_ids(table)[1]
    )
    first_by_ref = {e["referenced_data_file"]: e for e in first}
    merged_any = False
    for e in head:
        pos = iceberg.read_dv_blob(e["puffin_path"], e["offset"], e["length"])
        assert pos == sorted(set(pos))
        old = first_by_ref.get(e["referenced_data_file"])
        if old is not None and e["sequence_number"] > old["sequence_number"]:
            old_pos = iceberg.read_dv_blob(
                old["puffin_path"], old["offset"], old["length"]
            )
            assert set(old_pos) <= set(pos)  # merged, not chained
            merged_any = len(pos) > len(old_pos) or merged_any
    assert merged_any  # the overlap really exercised the merge path

    # time travel: the intermediate snapshot still reads correctly
    mid = iceberg.snapshot_ids(table)[1]
    want_mid = sorted((i, i % 5, float(i)) for i in range(100) if i % 5 != 3)
    assert _spark_rows(spark, table, mid) == want_mid
    assert sorted(indep.read_rows(table, mid)) == want_mid


def test_v3_dv_update_where_and_merge(spark, table):
    """UPDATE on a v3 table decomposes into a DV delete + append (no
    position-delete parquet anywhere); a copy-on-write MERGE commits an
    overwrite snapshot that sees through the DVs."""
    iceberg.create(_df(spark, _rows(20)), table, format_version=3)
    iceberg.update_where(
        spark, table, "k = 2", {"val": F.col("val") + 1000.0}
    )
    want = sorted(
        (i, i % 5, float(i) + (1000.0 if i % 5 == 2 else 0.0))
        for i in range(20)
    )
    assert _spark_rows(spark, table) == want
    assert sorted(indep.read_rows(table)) == want
    _no_position_delete_parquet(table)
    assert iceberg.snapshot_dv_entries(table)  # the delete half was a DV

    # copy-on-write MERGE on the DV'd table: updates id 0, inserts 777
    iceberg.merge(
        _df(spark, [(0, 9, -1.0), (777, 9, 7.0)]), table, keys=["id"]
    )
    want2 = sorted(
        [(0, 9, -1.0), (777, 9, 7.0)]
        + [t for t in want if t[0] != 0]
    )
    assert _spark_rows(spark, table) == want2
    assert sorted(indep.read_rows(table)) == want2
    # the overwrite rewrote data files: no DV survives at head
    assert iceberg.snapshot_dv_entries(table) == []


def test_v3_dv_batch_table_changes_net_state(spark, table):
    """include_deletes=True over a v3 history: each DV commit emits
    exactly its NEW kills (new DV minus the replaced one), and folding
    the signed feed reproduces the head snapshot."""
    iceberg.create(
        _df(spark, _rows(40)).repartitionByRange(3, "id"),
        table,
        format_version=3,
    )                                                     # seq 1
    iceberg.delete_where(spark, table, "k = 0")           # seq 2: 8 kills
    iceberg.append(_df(spark, [(100, 0, 1.0), (101, 1, 2.0)]), table)  # seq 3
    iceberg.delete_where(spark, table, "id < 5 OR id = 101")  # seq 4
    feed = iceberg.table_changes(
        spark, table, 0, include_deletes=True
    ).collect()

    dels = Counter(
        (r.id, r.k, r.val) for r in feed if r._change_type == "delete"
    )
    # seq 2 kills ids {0,5,10,15,20,25,30,35}; seq 4 kills ids
    # {1,2,3,4,101} (0 already dead — replace-merge must NOT re-emit it)
    assert dels == Counter(
        {(i, i % 5, float(i)): 1 for i in (0, 5, 10, 15, 20, 25, 30, 35)}
        | {(i, i % 5, float(i)): 1 for i in (1, 2, 3, 4)}
        | {(101, 1, 2.0): 1}
    )
    state = Counter()
    for r in feed:
        state[(r.id, r.k, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        (r.id, r.k, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head


def test_v3_dv_streaming_cdc_matches_batch_feed(spark, table, tmp_path):
    """The streaming CDC source decomposes v3 DV commits (the
    `pydatasource` DV branch): kills = new DV minus parent DV per file;
    the streamed feed equals the batch feed row-for-row and folds to
    the head snapshot."""
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    iceberg.create(
        _df(spark, _rows(30)).repartitionByRange(3, "id"),
        table,
        format_version=3,
    )
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink = str(tmp_path / "dv_sink")
    ckpt = str(tmp_path / "dv_ckpt")

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
    assert spark.read.parquet(sink).count() == 30

    iceberg.delete_where(spark, table, "k = 1")       # DV commit 1
    iceberg.delete_where(spark, table, "id < 8")      # DV commit 2, overlaps
    iceberg.append(_df(spark, [(200, 1, 5.0)]), table)
    drain()

    rows = spark.read.parquet(sink).collect()
    streamed = Counter(
        (r.id, r.k, r.val, r._change_type) for r in rows
    ) - Counter((i, i % 5, float(i), "insert") for i in range(30))
    batch = Counter(
        (r.id, r.k, r.val, r._change_type)
        for r in iceberg.table_changes(
            spark, table, 1, include_deletes=True
        ).collect()
    )
    assert streamed == batch

    dels = Counter((r.id, r.k, r.val) for r in rows if r._change_type == "delete")
    assert dels == Counter(
        {(i, i % 5, float(i)): 1 for i in (1, 6, 11, 16, 21, 26)}  # k=1
        | {(i, i % 5, float(i)): 1 for i in (0, 2, 3, 4, 5, 7)}    # id<8 new
    )
    state = Counter()
    for r in rows:
        state[(r.id, r.k, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        (r.id, r.k, r.val)
        for r in iceberg.read_iceberg(spark, table).collect()
    )
    assert +state == head
