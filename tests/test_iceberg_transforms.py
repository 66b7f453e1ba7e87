"""Iceberg partition transforms (spec §Partition Transforms): the spec's
published murmur3 hash vectors, write-path ↔ planning-path agreement
(the Spark bucket/day expressions must equal the driver-side Python
used for pruning), file-level pruning assertions (transform-partitioned
scans plan strictly fewer files from manifests alone), and interop with
the clean-room independent reader. Also covers the round-5 ADVICE
fixes: date identity partitions, date/timestamp manifest bounds,
null-key equality deletes, and the change-feed expiration guard."""

from __future__ import annotations

import datetime
import struct

import pytest

from march_mania_spark_lakehouse_spark.sources import iceberg
from tests import iceberg_reader_independent as indep


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


D0 = datetime.date(2024, 1, 1)


def _days_df(spark, n=200, days=5):
    rows = [
        (i, D0 + datetime.timedelta(days=i % days), f"k{i % 7}", float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, d date, key string, v double")


# --------------------------------------------------------------------------
# Spec hash vectors (iceberg spec Appendix B lists these exact values)
# --------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    assert iceberg.murmur3_32(struct.pack("<q", 34)) == 2017239379
    assert iceberg.murmur3_32(b"iceberg") == 1210000089
    d = datetime.date(2017, 11, 16)
    h = iceberg.murmur3_32(struct.pack("<q", (d - datetime.date(1970, 1, 1)).days))
    assert h - (1 << 32) == -653330422
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    micros = int((ts - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6)
    hts = iceberg.murmur3_32(struct.pack("<q", micros))
    assert hts - (1 << 32) == -2047944441


def test_apply_transform_values():
    d = datetime.date(2017, 11, 16)
    assert iceberg.apply_transform("day", d, "date") == 17486
    assert iceberg.apply_transform("month", d, "date") == (2017 - 1970) * 12 + 10
    assert iceberg.apply_transform("year", d, "date") == 47
    ts = datetime.datetime(2017, 11, 16, 22, 0, 0)
    assert iceberg.apply_transform("hour", ts, "timestamptz") == 17486 * 24 + 22
    # truncate uses floor-mod (spec: -1 truncates to -10 at width 10)
    assert iceberg.apply_transform("truncate[10]", -1, "long") == -10
    assert iceberg.apply_transform("truncate[3]", "iceberg", "string") == "ice"
    assert iceberg.apply_transform("bucket[16]", 34, "long") == iceberg.bucket_of(
        34, "long", 16
    )
    for tr in ("day", "bucket[4]", "truncate[2]"):
        assert iceberg.apply_transform(tr, None, "long" if tr != "day" else "date") is None


# --------------------------------------------------------------------------
# Write path ↔ planning path agreement
# --------------------------------------------------------------------------


def test_day_bucket_round_trip_and_reader_parity(spark, table):
    df = _days_df(spark)
    iceberg.create(df, table, partition_by=["day(d)", "bucket(4, key)"])
    back = iceberg.read_iceberg(spark, table)
    assert sorted(back.collect()) == sorted(df.collect())
    # clean-room reader agrees (source columns live IN the data files —
    # hidden partitioning, nothing restored from the tuple)
    assert sorted(indep.read_rows(table)) == sorted(tuple(r) for r in back.collect())


def test_manifest_tuples_match_driver_side_transforms(spark, table):
    df = _days_df(spark, n=60)
    iceberg.create(df, table, partition_by=["day(d)", "bucket(4, key)"])
    meta = iceberg.current_metadata(table)
    snap = iceberg._snapshot(meta, meta["current-snapshot-id"])
    from march_mania_spark_lakehouse_spark.sources import avro_ocf
    import pyarrow.parquet as pq

    checked = 0
    for m in avro_ocf.read_ocf(snap["manifest-list"]):
        for e in avro_ocf.read_ocf(m["manifest_path"]):
            part = e["data_file"]["partition"]
            t = pq.read_table(e["data_file"]["file_path"])
            for rec in t.to_pylist():
                # every row in the file must map to the file's tuple
                assert iceberg.apply_transform("day", rec["d"], "date") == part["d_day"]
                assert (
                    iceberg.bucket_of(rec["key"], "string", 4) == part["key_bucket"]
                )
                checked += 1
    assert checked == 60


def test_scan_partition_prunes_files_by_day_and_bucket(spark, table):
    df = _days_df(spark)
    iceberg.create(df, table, partition_by=["day(d)", "bucket(4, key)"])
    n_all = len(iceberg.snapshot_files(table))
    one_day = iceberg.scan_partition(spark, table, {"d": D0 + datetime.timedelta(days=2)})
    want = df.filter(f"d = date'{D0 + datetime.timedelta(days=2)}'")
    assert sorted(one_day.collect()) == sorted(want.collect())
    # file-level: one of five days planned
    assert one_day.inputFiles() and len(one_day.inputFiles()) <= n_all // 5 + 1

    eq = iceberg.scan_eq(spark, table, "key", "k3")
    assert sorted(eq.collect()) == sorted(df.filter("key = 'k3'").collect())
    # bucket pruning keeps exactly k3's bucket dir, a quarter of the files
    b = iceberg.bucket_of("k3", "string", 4)
    kept = eq.inputFiles()
    assert kept and all(f"key_bucket={b}" in f for f in kept)
    assert len(kept) < n_all // 2


def test_scan_range_prunes_from_day_partition_tuple(spark, table):
    df = _days_df(spark)
    iceberg.create(df, table, partition_by=["day(d)"])
    lo, hi = D0 + datetime.timedelta(days=1), D0 + datetime.timedelta(days=2)
    rng = iceberg.scan_range(spark, table, "d", lo, hi)
    assert sorted(rng.collect()) == sorted(
        df.filter((df.d >= lo) & (df.d <= hi)).collect()
    )
    n_all = len(iceberg.snapshot_files(table))
    # 2 of 5 days planned, from the partition tuples alone (no stat_cols)
    assert len(rng.inputFiles()) <= (2 * n_all) // 5 + 1


def test_bucket_is_never_range_pruned(spark, table):
    # hashing scrambles order: a range scan over a bucketed column must
    # conservatively keep every bucket (correctness over cleverness)
    df = _days_df(spark)
    iceberg.create(df, table, partition_by=["bucket(4, id)"])
    rng = iceberg.scan_range(spark, table, "id", 10, 20)
    assert sorted(r["id"] for r in rng.collect()) == list(range(10, 21))


def test_truncate_and_month_transforms(spark, table):
    df = _days_df(spark, n=80, days=40)  # spans two months
    iceberg.create(df, table, partition_by=["month(d)", "truncate(2, key)"])
    back = iceberg.read_iceberg(spark, table)
    assert sorted(back.collect()) == sorted(df.collect())
    feb = iceberg.scan_partition(spark, table, {"d": datetime.date(2024, 2, 3)})
    assert sorted(feb.collect()) == sorted(df.filter("month(d) = 2").collect())


def test_hour_transform_on_timestamps(spark, table):
    rows = [
        (i, datetime.datetime(2024, 1, 1, i % 4, 30, 0), float(i)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    iceberg.create(df, table, partition_by=["hour(ts)"])
    back = iceberg.read_iceberg(spark, table)
    assert sorted(back.collect()) == sorted(df.collect())
    h1 = iceberg.scan_partition(
        spark, table, {"ts": datetime.datetime(2024, 1, 1, 1, 0, 0)}
    )
    assert h1.count() == 10


def test_identity_timestamp_partition_rejected(spark, table):
    rows = [(1, datetime.datetime(2024, 1, 1, 0, 0, 0))]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    with pytest.raises(NotImplementedError):
        iceberg.create(df, table, partition_by=["ts"])


def test_bad_transform_specs_rejected(spark, table):
    df = _days_df(spark, n=5)
    for spec in ("day(id)", "hour(d)", "bucket(4, v)", "truncate(2, d)", "day(nope)"):
        with pytest.raises((ValueError, NotImplementedError)):
            iceberg.create(df, table + spec.replace("(", "_").replace(")", ""),
                           partition_by=[spec])


# --------------------------------------------------------------------------
# Round-5 ADVICE fixes
# --------------------------------------------------------------------------


def test_identity_date_partition_round_trips_both_readers(spark, table):
    # ADVICE: date identity partitions used to crash the Avro commit
    df = _days_df(spark)
    iceberg.create(df, table, partition_by=["d"])
    back = iceberg.read_iceberg(spark, table)
    assert sorted(back.collect()) == sorted(df.collect())
    assert sorted(indep.read_rows(table)) == sorted(tuple(r) for r in back.collect())
    one = iceberg.scan_partition(spark, table, {"d": D0})
    assert one.count() == 40


def test_scan_range_on_date_bounds(spark, table):
    # ADVICE: date bounds used to raise NotImplementedError at plan time
    df = _days_df(spark).repartitionByRange(4, "d")
    iceberg.create(df, table, stat_cols=("d",))
    lo, hi = D0 + datetime.timedelta(days=1), D0 + datetime.timedelta(days=2)
    rng = iceberg.scan_range(spark, table, "d", lo, hi)
    assert sorted(rng.collect()) == sorted(
        df.filter((df.d >= lo) & (df.d <= hi)).collect()
    )


def test_scan_range_restores_identity_partition_columns(spark, table):
    # ADVICE: scan_range used a bare spark.read.parquet — on a
    # partitioned table the partition column vanished
    df = _days_df(spark)
    iceberg.create(df, table, partition_by=["key"], stat_cols=("id",))
    rng = iceberg.scan_range(spark, table, "id", 10, 50)
    assert rng.columns == ["id", "d", "key", "v"]
    assert sorted(rng.collect()) == sorted(
        df.filter((df.id >= 10) & (df.id <= 50)).collect()
    )


def test_null_key_equality_delete_matches_null_rows(spark, table):
    # ADVICE: null == null is null in Spark; the spec wants null-safe
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "id long, k string")
    iceberg.create(df, table)
    iceberg.delete_by_equality(spark, table, spark.createDataFrame([(None,)], "k string"))
    assert sorted(r["id"] for r in iceberg.read_iceberg(spark, table).collect()) == [1, 3]
    assert sorted(r[0] for r in indep.read_rows(table)) == [1, 3]


def test_table_changes_refuses_expired_range(spark, table):
    # ADVICE: an expired commit inside the range must raise, not
    # silently misreport
    df = spark.createDataFrame([(1,)], "id long")
    iceberg.create(df, table)
    iceberg.append(spark.createDataFrame([(2,)], "id long"), table)
    iceberg.append(spark.createDataFrame([(3,)], "id long"), table)
    iceberg.expire_snapshots(table, keep_last=1)
    with pytest.raises(iceberg.IcebergNonAppendChangeError):
        iceberg.table_changes(spark, table, 0)
    with pytest.raises(iceberg.IcebergNonAppendChangeError):
        iceberg.table_changes(spark, table, 1)
    # a range fully inside retained history still works
    assert iceberg.table_changes(spark, table, 3).count() == 0


def test_table_changes_with_deletes_pos_and_eq(spark, table):
    """Iceberg CDC: position-delete commits emit their tombstoned rows
    as deletes, an upsert emits delete(old)+insert(new) via the
    equality tombstone's alive-at-parent semantics, and net(changes)
    applied to the base equals the head snapshot."""
    from collections import Counter

    def rows(lo, hi):
        return spark.createDataFrame(
            [(i, f"k{i % 3}", float(i)) for i in range(lo, hi)],
            "id long, k string, v double",
        )

    iceberg.create(rows(0, 40), table)                       # seq 1
    iceberg.append(rows(40, 50), table)                      # seq 2
    iceberg.delete_where(spark, table, "id % 10 = 0")        # seq 3
    up = spark.createDataFrame(
        [(5, "up", -1.0), (100, "new", -2.0)], "id long, k string, v double"
    )
    iceberg.upsert(spark, table, up, ["id"])                 # seq 4+5
    ch = iceberg.table_changes(spark, table, 0, include_deletes=True)
    ins = sorted((r["id"], r["v"]) for r in ch.filter("_change_type='insert'").collect())
    dels = sorted((r["id"], r["v"]) for r in ch.filter("_change_type='delete'").collect())
    assert ins == sorted(
        [(i, float(i)) for i in range(50)] + [(5, -1.0), (100, -2.0)]
    )
    assert dels == sorted(
        [(i, float(i)) for i in range(50) if i % 10 == 0] + [(5, 5.0)]
    )
    net = Counter()
    for r in ch.collect():
        t = (r["id"], r["k"], r["v"])
        net[t] += 1 if r["_change_type"] == "insert" else -1
    head = Counter(tuple(r) for r in iceberg.read_iceberg(spark, table).collect())
    assert +net == head
    # append-only mode refuses the delete range; partial ranges fine
    with pytest.raises(iceberg.IcebergNonAppendChangeError):
        iceberg.table_changes(spark, table, 2).count()
    assert iceberg.table_changes(spark, table, 1, 2).count() == 10


def test_pos_delete_after_eq_delete_never_double_tombstones(spark, table):
    """delete_where scans through ALL existing deletes (incl. equality)
    so a predicate matching an already-eq-deleted row writes no second
    tombstone — the invariant the CDC decomposition relies on."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    iceberg.create(df, table)
    iceberg.delete_by_equality(
        spark, table, spark.createDataFrame([(4,)], "id long")
    )
    iceberg.delete_where(spark, table, "id % 2 = 0")  # 4 already dead
    ch = iceberg.table_changes(spark, table, 0, include_deletes=True)
    dels = sorted(r["id"] for r in ch.filter("_change_type='delete'").collect())
    assert dels == sorted(i for i in range(20) if i % 2 == 0)  # 4 once
    assert sorted(r["id"] for r in iceberg.read_iceberg(spark, table).collect()) \
        == [i for i in range(20) if i % 2 == 1]
