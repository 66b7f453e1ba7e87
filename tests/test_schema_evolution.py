"""Column-level schema evolution on the Iceberg layer: RENAME and DROP
as metadata-only commits, with per-generation physical-name resolution
on the read path (and the spec's ``schema.name-mapping.default``
property for external readers — exercised through the independent
clean-room reader).

The invariants each test pins:
- rename/drop move ZERO data bytes (the live file set is unchanged);
- current reads see current names over ALL generations (a failed
  resolution would surface as nulls in old-generation rows);
- time travel to a pre-rename snapshot reads under the old name;
- the honest gates refuse the cases that would silently corrupt a
  read path (identity partitioning, live equality-delete keys, name
  reuse across field-ids).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import iceberg

from tests import iceberg_reader_independent as indie


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@pytest.fixture()
def evolved_table(spark, sf_dir, tmp_path):
    """Create → append gen-A → rename o_orderstatus→status → append
    gen-B under the new name. Returns (table, full expected df)."""
    orders = _orders(spark, sf_dir)
    t = str(tmp_path / "orders_evolved")
    gen_a = orders.filter(F.col("o_orderkey") % 3 == 0)
    gen_b = orders.filter(F.col("o_orderkey") % 3 != 0)
    iceberg.create(gen_a, t, stat_cols=["o_orderkey"])
    iceberg.rename_column(t, "o_orderstatus", "status")
    iceberg.append(
        gen_b.withColumnRenamed("o_orderstatus", "status"),
        t,
        stat_cols=["o_orderkey"],
    )
    return t, orders


def test_rename_is_metadata_only(evolved_table, spark):
    t, _ = evolved_table
    sids = iceberg.snapshot_ids(t)
    files_gen_a = set(iceberg.snapshot_files(t, sids[0]))
    assert files_gen_a <= set(iceberg.snapshot_files(t, sids[1]))
    # gen-A files physically still carry the OLD column name
    import pyarrow.parquet as pq

    phys = {n for f in files_gen_a for n in pq.read_schema(os.path.join(t, f)).names}
    assert "o_orderstatus" in phys and "status" not in phys


def test_current_read_resolves_all_generations(evolved_table, spark):
    t, orders = evolved_table
    got = iceberg.read_iceberg(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "status", "o_totalprice"]
    # no nulls leaked from a failed old-generation resolution
    assert got.filter(F.col("status").isNull()).count() == 0
    exp = (
        orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()
    )
    act = {
        (r["status"]): (r["n"], r["s"])
        for r in got.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()
    }
    assert {r["o_orderstatus"]: (r["n"], r["s"]) for r in exp} == act


def test_time_travel_reads_old_name(evolved_table, spark):
    t, orders = evolved_table
    first = iceberg.snapshot_ids(t)[0]
    old = iceberg.read_iceberg(spark, t, first)
    assert "o_orderstatus" in old.columns and "status" not in old.columns
    assert old.count() == orders.filter(F.col("o_orderkey") % 3 == 0).count()


def test_independent_reader_resolves_renames(evolved_table, spark):
    t, orders = evolved_table
    rows = indie.read_rows(t)
    assert len(rows) == orders.count()
    # status is column index 2 in declared order; count per status value
    from collections import Counter

    got = Counter(r[2] for r in rows)
    exp = Counter(
        r["o_orderstatus"]
        for r in orders.select("o_orderstatus").collect()
    )
    assert got == exp
    # name-mapping property is present and covers the renamed field
    meta = iceberg.current_metadata(t)
    assert "schema.name-mapping.default" in meta["properties"]
    import json

    mp = json.loads(meta["properties"]["schema.name-mapping.default"])
    hist = {m["field-id"]: m["names"] for m in mp}
    assert any(set(v) >= {"o_orderstatus", "status"} for v in hist.values())


def test_rename_then_scan_range_prunes_and_answers(evolved_table, spark):
    t, orders = evolved_table
    out = iceberg.scan_range(spark, t, "o_orderkey", 100, 5000)
    exp = orders.filter(F.col("o_orderkey").between(100, 5000))
    assert out.count() == exp.count()
    assert "status" in out.columns


def test_drop_column_metadata_only_and_hidden(evolved_table, spark):
    t, orders = evolved_table
    before = set(iceberg.snapshot_files(t))
    iceberg.drop_column(t, "o_totalprice")
    assert set(iceberg.snapshot_files(t)) == before
    got = iceberg.read_iceberg(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "status"]
    assert got.count() == orders.count()
    # time travel still shows the dropped column (old schema generation)
    first = iceberg.snapshot_ids(t)[0]
    assert "o_totalprice" in iceberg.read_iceberg(spark, t, first).columns


def test_rename_after_drop_and_append_roundtrip(evolved_table, spark):
    t, orders = evolved_table
    iceberg.drop_column(t, "o_totalprice")
    iceberg.rename_column(t, "o_custkey", "customer_id")
    got = iceberg.read_iceberg(spark, t)
    assert got.columns == ["o_orderkey", "customer_id", "status"]
    assert got.filter(F.col("customer_id").isNull()).count() == 0


def test_rename_gate_identity_partition_source_only(spark, sf_dir, tmp_path):
    """Round 11 narrowed the gate: only the partition SOURCE column is
    physically keyed (hive dirs, manifest tuples, basePath
    restoration) — renaming any OTHER column on an identity-partitioned
    table is plain name-history resolution and works."""
    orders = _orders(spark, sf_dir).withColumn(
        "bucket3", (F.col("o_orderkey") % 3).cast("long")
    )
    t = str(tmp_path / "orders_idpart")
    iceberg.create(orders, t, partition_by=["bucket3"])
    with pytest.raises(NotImplementedError, match="partition source"):
        iceberg.rename_column(t, "bucket3", "bucket")
    iceberg.rename_column(t, "o_orderstatus", "status")
    got = iceberg.read_iceberg(spark, t)
    assert "status" in got.columns and "bucket3" in got.columns
    # partition values restored AND renamed column resolves per footer
    assert got.filter(F.col("bucket3").isNull()).count() == 0
    assert got.filter(F.col("status").isNull()).count() == 0
    orig = _orders(spark, sf_dir)
    assert got.count() == orig.count()


def test_rename_gate_name_reuse(evolved_table):
    t, _ = evolved_table
    # the renamed field's OLD name cannot be claimed by another field
    with pytest.raises(ValueError, match="another column"):
        iceberg.rename_column(t, "o_totalprice", "o_orderstatus")
    # nor can a current name
    with pytest.raises(ValueError):
        iceberg.rename_column(t, "o_totalprice", "status")


def test_rename_gate_live_equality_delete_key(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = str(tmp_path / "orders_eqdel")
    iceberg.create(orders, t)
    iceberg.delete_by_equality(spark, t, orders.select("o_orderkey").limit(5))
    with pytest.raises(NotImplementedError, match="equality-delete"):
        iceberg.rename_column(t, "o_orderkey", "okey")
    with pytest.raises(NotImplementedError, match="equality-delete"):
        iceberg.drop_column(t, "o_orderkey")


def test_drop_gate_partition_source(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    t = str(tmp_path / "orders_daypart")
    iceberg.create(orders, t, partition_by=["day(o_orderdate)"])
    with pytest.raises(ValueError, match="partition source"):
        iceberg.drop_column(t, "o_orderdate")


def test_readd_dropped_name_refused(evolved_table, spark):
    t, orders = evolved_table
    iceberg.drop_column(t, "o_totalprice")
    new_rows = (
        iceberg.read_iceberg(spark, t)
        .limit(1)
        .withColumn("o_totalprice", F.lit(1.0))
    )
    with pytest.raises(iceberg.IcebergSchemaMismatchError, match="fresh name"):
        iceberg.append(new_rows, t, merge_schema=True)


def test_rename_on_transform_partitioned_source(spark, sf_dir, tmp_path):
    """Hidden partitioning: the day() source column lives IN the files,
    so renaming it is allowed and scans under the new name still work."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    t = str(tmp_path / "orders_day_renamed")
    iceberg.create(orders, t, partition_by=["day(o_orderdate)"])
    iceberg.rename_column(t, "o_orderstatus", "status")
    got = iceberg.read_iceberg(spark, t)
    assert "status" in got.columns
    assert got.count() == orders.count()
    assert got.filter(F.col("status").isNull()).count() == 0


# --------------------------------------------------------------------------
# Type widening (spec type promotion): int→long / float→double
# --------------------------------------------------------------------------


def _mixed(spark):
    return spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5), (3, 30, 3.5)],
        "id long, small int, ratio float",
    )


def test_widen_metadata_only_reads_both_generations(spark, tmp_path):
    t = str(tmp_path / "widen")
    iceberg.create(_mixed(spark), t, stat_cols=["small"])
    before = set(iceberg.snapshot_files(t))
    iceberg.widen_column(t, "small", "long")
    iceberg.widen_column(t, "ratio", "double")
    assert set(iceberg.snapshot_files(t)) == before  # zero files touched
    wide = spark.createDataFrame(
        [(4, 2**40, 4.5)], "id long, small long, ratio double"
    )
    iceberg.append(wide, t, stat_cols=["small"])
    got = iceberg.read_iceberg(spark, t)
    assert dict(got.dtypes)["small"] == "bigint"
    assert dict(got.dtypes)["ratio"] == "double"
    vals = sorted((r.id, r.small, r.ratio) for r in got.collect())
    assert vals == [(1, 10, 1.5), (2, 20, 2.5), (3, 30, 3.5), (4, 2**40, 4.5)]


def test_widen_time_travel_keeps_narrow_type(spark, tmp_path):
    t = str(tmp_path / "widen_tt")
    iceberg.create(_mixed(spark), t)
    first = iceberg.snapshot_ids(t)[0]
    iceberg.widen_column(t, "small", "long")
    old = iceberg.read_iceberg(spark, t, first)
    assert dict(old.dtypes)["small"] == "int"


def test_widen_bounds_pruning_across_promotion(spark, tmp_path):
    """scan_range over a widened column must decode OLD manifests'
    4-byte int bounds (write-time encoding, Appendix D) AND new 8-byte
    long bounds, pruning correctly from both."""
    t = str(tmp_path / "widen_bounds")
    iceberg.create(_mixed(spark).coalesce(1), t, stat_cols=["small"])
    iceberg.widen_column(t, "small", "long")
    big = spark.createDataFrame(
        [(5, 1_000_000, 5.5)], "id long, small long, ratio float"
    ).coalesce(1)
    iceberg.append(
        big.withColumn("ratio", big.ratio.cast("float")), t, stat_cols=["small"]
    )
    hit = iceberg.scan_range(spark, t, "small", 900_000, 2_000_000)
    assert [r.small for r in hit.collect()] == [1_000_000]
    # the narrow-range scan plans ONLY the old file (metadata pruning)
    lo = iceberg.scan_range(spark, t, "small", 5, 25)
    assert sorted(r.small for r in lo.collect()) == [10, 20]


def test_widen_gates(spark, tmp_path):
    t = str(tmp_path / "widen_gates")
    iceberg.create(_mixed(spark), t)
    with pytest.raises(ValueError, match="not a sanctioned promotion"):
        iceberg.widen_column(t, "small", "double")
    with pytest.raises(ValueError, match="not a sanctioned promotion"):
        iceberg.widen_column(t, "id", "int")  # narrowing refused
    # (partition SOURCE columns widen since round 8 — see the
    # dedicated tests below)


def test_widen_partition_source_identity_int(spark, tmp_path):
    """int → long widening of an IDENTITY partition source: old
    manifests keep int partition tuples, new ones write long; both
    restore under the widened type and both prune through one
    scan_partition call (Python int equality unifies the encodings)."""
    t = str(tmp_path / "widen_part_id")
    iceberg.create(_mixed(spark), t, partition_by=["small"])
    iceberg.widen_column(t, "small", "long")
    iceberg.append(
        spark.createDataFrame(
            [(4, 2**40, 4.5), (5, 10, 5.5)],
            "id long, small long, ratio float",
        ).withColumn("ratio", F.col("ratio").cast("float")),
        t,
    )
    got = iceberg.read_iceberg(spark, t)
    assert dict(got.dtypes)["small"] == "bigint"
    assert sorted((r.id, r.small) for r in got.collect()) == [
        (1, 10), (2, 20), (3, 30), (4, 2**40), (5, 10),
    ]
    # pruning matches BOTH generations of the same partition value
    hit = iceberg.scan_partition(spark, t, {"small": 10})
    assert sorted(r.id for r in hit.collect()) == [1, 5]
    assert [r.id for r in iceberg.scan_partition(
        spark, t, {"small": 2**40}
    ).collect()] == [4]
    # the clean-room reader restores both generations identically
    assert sorted(r[:2] for r in indie.read_rows(t)) == [
        (1, 10), (2, 20), (3, 30), (4, 2**40), (5, 10),
    ]


def test_widen_partition_source_bucket_transform(spark, tmp_path):
    """bucket(N, col) survives int → long widening BY SPEC DESIGN (int
    is hashed as an 8-byte block, so bucket(int x) == bucket(long x)):
    a point lookup after widening must find old-int and new-long rows
    of the same key in the same bucket."""
    t = str(tmp_path / "widen_part_bucket")
    iceberg.create(_mixed(spark), t, partition_by=["bucket(2, small)"])
    iceberg.widen_column(t, "small", "long")
    iceberg.append(
        spark.createDataFrame(
            [(6, 10, 6.5)], "id long, small long, ratio float"
        ).withColumn("ratio", F.col("ratio").cast("float")),
        t,
    )
    hit = iceberg.scan_partition(spark, t, {"small": 10})
    assert sorted(r.id for r in hit.collect()) == [1, 6]
    # and the lookup really pruned: fewer files planned than the table
    assert len(hit.inputFiles()) < len(
        iceberg.read_iceberg(spark, t).inputFiles()
    )


def test_widen_partition_source_identity_float(spark, tmp_path):
    """float → double widening of an identity partition source: Avro
    float tuples decode to the EXACT upcast double, so restored values
    and pruning agree across the boundary."""
    import struct as _struct

    up = lambda s: _struct.unpack("<f", _struct.pack("<f", float(s)))[0]
    t = str(tmp_path / "widen_part_f")
    df = spark.createDataFrame(
        [(1, 0.1), (2, 1.5)], "id long, p double"
    ).withColumn("p", F.col("p").cast("float"))
    iceberg.create(df, t, partition_by=["p"])
    iceberg.widen_column(t, "p", "double")
    got = {(r.id, r.p) for r in iceberg.read_iceberg(spark, t).collect()}
    assert got == {(1, up("0.1")), (2, 1.5)}
    hit = iceberg.scan_partition(spark, t, {"p": up("0.1")})
    assert [r.id for r in hit.collect()] == [1]


def test_widen_composes_with_rename(spark, tmp_path):
    t = str(tmp_path / "widen_rename")
    iceberg.create(_mixed(spark), t)
    iceberg.widen_column(t, "small", "long")
    iceberg.rename_column(t, "small", "counter")
    wide = spark.createDataFrame(
        [(9, 2**35, 9.5)], "id long, counter long, ratio float"
    )
    iceberg.append(wide, t)
    got = iceberg.read_iceberg(spark, t)
    assert dict(got.dtypes)["counter"] == "bigint"
    assert got.filter(F.col("counter").isNull()).count() == 0
    assert got.count() == 4
    rows = indie.read_rows(t)
    assert sorted(r[1] for r in rows) == [10, 20, 30, 2**35]


def test_delete_and_update_immediately_after_rename(evolved_table, spark):
    """rename_column is metadata-only (no snapshot restamps), but DELETE
    and UPDATE are current-state operations: their predicates must
    resolve the CURRENT (renamed) column names even before any other
    snapshot commits — the read under a stale stamped schema-id used to
    raise AnalysisException here."""
    t, orders = evolved_table
    iceberg.rename_column(t, "o_totalprice", "price")
    # no snapshot between the rename and the DML
    iceberg.delete_where(spark, t, "price > 100000.0")
    got = iceberg.read_iceberg(spark, t)
    assert got.filter(F.col("price") > 100000.0).count() == 0
    expected = orders.filter(F.col("o_totalprice") <= 100000.0).count()
    assert got.count() == expected

    iceberg.rename_column(t, "price", "total")
    iceberg.update_where(
        spark, t, "total < 1000.0", {"status": F.lit("X")}
    )
    after = iceberg.read_iceberg(spark, t)
    assert after.filter(
        (F.col("total") < 1000.0) & (F.col("status") != "X")
    ).count() == 0
    assert after.count() == expected  # UPDATE preserves row count


def test_update_where_rejects_unknown_assignment_column(evolved_table, spark):
    t, _ = evolved_table
    with pytest.raises(KeyError, match="non-columns.*o_statuss"):
        iceberg.update_where(
            spark, t, "o_orderkey = 3", {"o_statuss": F.lit("T")}
        )


def test_write_statistics_resolves_snapshot_schema_after_rename(
    evolved_table, spark
):
    """An explicit-snapshot stats run after a rename must resolve the
    column under THAT snapshot's schema (old name) and record the
    stable field-id, so current-name NDV lookups still find it."""
    t, _ = evolved_table
    sids = iceberg.snapshot_ids(t)
    # snapshot 0 predates the rename: its schema calls the column
    # o_orderstatus; the current schema calls it status
    entry = iceberg.write_statistics(
        spark, t, ["o_orderstatus"], snapshot_id=sids[0]
    )
    assert entry["snapshot-id"] == sids[0]
    # field-ids are rename-stable, so the CURRENT name resolves the blob
    assert iceberg.table_ndv(t, "status", snapshot_id=sids[0]) >= 1
    # and the current name is NOT in the old generation
    with pytest.raises(KeyError, match="not in schema generation"):
        iceberg.write_statistics(spark, t, ["status"], snapshot_id=sids[0])
    # current-snapshot run uses the current name
    cur = iceberg.write_statistics(spark, t, ["status"])
    assert cur["snapshot-id"] == sids[-1]


def test_iceberg_special_char_partition_values(spark, tmp_path):
    """Identity partition values with hive-escaped chars (':' → %3A,
    '%' → %25): both readers agree, and a merge-on-read DELETE inside
    the escaped partition dir kills exactly its rows — the position-
    delete join runs on DECODED on-disk paths, so the URI-encoded
    _metadata.file_path can't make tombstones miss."""
    t = str(tmp_path / "ice_esc")
    df = spark.createDataFrame(
        [(1, "x:y", 1.0), (2, "plain", 2.0), (3, "a b%c", 3.0), (4, "x:y", 4.0)],
        "id long, g string, val double",
    )
    iceberg.create(df, t, partition_by=["g"])
    got = sorted(tuple(r) for r in iceberg.read_iceberg(spark, t).collect())
    assert got == sorted(tuple(r) for r in df.collect())
    assert sorted(indie.read_rows(t)) == got
    iceberg.delete_where(spark, t, "g = 'x:y'")
    after = iceberg.read_iceberg(spark, t)
    assert sorted(r.id for r in after.collect()) == [2, 3]
    assert len(indie.read_rows(t)) == 2
