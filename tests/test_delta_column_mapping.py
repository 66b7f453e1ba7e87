"""Delta column mapping (`delta.columnMapping.mode = name`): RENAME and
DROP as metadata-only commits. Physical names are pinned per field at
upgrade time and never change, so every file — any generation — scans
under one physical schema and a single alias pass restores the logical
view (contrast the Iceberg layer's per-generation resolution).

Pinned invariants: zero files rewritten; current reads stitch all
generations under current names; time travel reads each version's own
schemaString; stats-based pruning still prunes (stat keys are physical);
deletion vectors compose with renames; re-added logical names get fresh
col-<uuid> physical names and never resurrect dropped bytes; the
independent clean-room reader agrees throughout.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log

from tests import delta_reader_independent as indie


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@pytest.fixture()
def mapped_table(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = str(tmp_path / "orders_delta_mapped")
    gen_a = orders.filter(F.col("o_orderkey") % 3 == 0)
    gen_b = orders.filter(F.col("o_orderkey") % 3 != 0)
    delta_log.create(gen_a, t, stat_cols=["o_orderkey"])
    delta_log.rename_column(t, "o_orderstatus", "status")
    delta_log.append(
        gen_b.withColumnRenamed("o_orderstatus", "status"),
        t,
        stat_cols=["o_orderkey"],
    )
    return t, orders


def test_rename_is_metadata_only_and_physical_names_fixed(mapped_table, spark):
    t, _ = mapped_table
    v1_files = set(delta_log.snapshot_files(t, 0))
    assert v1_files <= set(delta_log.snapshot_files(t))
    # EVERY file (old and new generation) stores the SAME physical name
    import pyarrow.parquet as pq

    for f in delta_log.snapshot_files(t):
        assert "o_orderstatus" in pq.read_schema(os.path.join(t, f)).names


def test_current_read_under_logical_names(mapped_table, spark):
    t, orders = mapped_table
    got = delta_log.read_delta(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "status", "o_totalprice"]
    assert got.filter(F.col("status").isNull()).count() == 0
    exp = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    act = {
        r["status"]: r["n"]
        for r in got.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert exp == act


def test_time_travel_reads_old_name(mapped_table, spark):
    t, orders = mapped_table
    old = delta_log.read_delta(spark, t, 0)
    assert "o_orderstatus" in old.columns and "status" not in old.columns
    assert old.count() == orders.filter(F.col("o_orderkey") % 3 == 0).count()


def test_independent_reader_resolves_mapping(mapped_table, spark):
    t, orders = mapped_table
    rows = indie.read_rows(t)
    assert len(rows) == orders.count()
    from collections import Counter

    got = Counter(r[2] for r in rows)  # status at declared index 2
    exp = Counter(r[0] for r in orders.select("o_orderstatus").collect())
    assert got == exp


def test_stats_pruning_survives_rename(mapped_table, spark):
    t, orders = mapped_table
    out = delta_log.scan_pruned(spark, t, "o_orderkey", 100, 5000)
    exp = orders.filter(F.col("o_orderkey").between(100, 5000))
    assert out.count() == exp.count()
    assert "status" in out.columns


def test_drop_column_hides_but_time_travel_shows(mapped_table, spark):
    t, orders = mapped_table
    v_before = delta_log.latest_version(t)
    before = set(delta_log.snapshot_files(t))
    delta_log.drop_column(t, "o_totalprice")
    assert set(delta_log.snapshot_files(t)) == before
    got = delta_log.read_delta(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "status"]
    assert got.count() == orders.count()
    assert "o_totalprice" in delta_log.read_delta(spark, t, v_before).columns


def test_readded_name_gets_fresh_physical_and_reads_null_for_old(
    mapped_table, spark
):
    t, orders = mapped_table
    delta_log.drop_column(t, "o_totalprice")
    one = (
        delta_log.read_delta(spark, t)
        .limit(1)
        .withColumn("o_totalprice", F.lit(123.5))
    )
    delta_log.append(one, t, merge_schema=True)
    meta = delta_log._latest_metadata(t, delta_log.latest_version(t))
    fields = {
        f["name"]: f for f in json.loads(meta["schemaString"])["fields"]
    }
    phys = fields["o_totalprice"]["metadata"]["delta.columnMapping.physicalName"]
    assert phys.startswith("col-")  # fresh physical name, protocol rule
    got = delta_log.read_delta(spark, t)
    # old rows must NOT resurrect the dropped column's bytes
    assert got.filter(F.col("o_totalprice").isNotNull()).count() == 1
    assert indie.read_rows(t) and len(indie.read_rows(t)) == got.count()


def test_rename_composes_with_deletion_vectors(mapped_table, spark):
    t, orders = mapped_table
    n_before = delta_log.read_delta(spark, t).count()
    ndel = delta_log.read_delta(spark, t).filter("o_orderkey % 10 = 0").count()
    delta_log.delete_where(spark, t, "o_orderkey % 10 = 0")
    got = delta_log.read_delta(spark, t)
    assert got.count() == n_before - ndel
    assert got.filter(F.col("status").isNull()).count() == 0
    assert len(indie.read_rows(t)) == n_before - ndel


def test_mapping_composes_with_partitioned_table(spark, sf_dir, tmp_path):
    """Column mapping on a PARTITIONED table (the round-6 gate, now a
    feature): renames — of data columns AND of the partition column —
    are metadata-only; reads restore partition values from the log
    under the mapping; post-rename writes land under physical names;
    log-planned partition pruning still prunes."""
    orders = _orders(spark, sf_dir).withColumn(
        "mod3", (F.col("o_orderkey") % 3).cast("string")
    )
    t = str(tmp_path / "orders_part_delta")
    delta_log.create(orders, t, partition_by=["mod3"], stat_cols=["o_orderkey"])
    n = orders.count()
    delta_log.rename_column(t, "o_orderstatus", "status")
    delta_log.rename_column(t, "mod3", "bucket3")  # the partition column
    assert delta_log.table_partition_columns(t) == ["bucket3"]
    got = delta_log.read_delta(spark, t)
    assert got.count() == n
    assert {"status", "bucket3"} <= set(got.columns)
    # partition values restored from the log, grouped counts match
    want = {
        str(r["mod3"]): r["n"]
        for r in orders.groupBy("mod3").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {
        r["bucket3"]: r["n"]
        for r in got.groupBy("bucket3").agg(F.count(F.lit(1)).alias("n")).collect()
    } == want
    # post-rename append under the NEW logical names writes physical
    # dirs and partitionValues that old and new files share
    extra = spark.createDataFrame(
        [(10_000_001, 1, "F", 1.0, "9")],
        "o_orderkey long, o_custkey long, status string, "
        "o_totalprice double, bucket3 string",
    )
    delta_log.append(extra, t, stat_cols=["o_orderkey"])
    # log-planned pruning under the CURRENT logical name
    nine = delta_log.scan_partitions(spark, t, {"bucket3": "9"})
    assert [r.o_orderkey for r in nine.collect()] == [10_000_001]
    one = delta_log.scan_partitions(spark, t, {"bucket3": "1"})
    assert one.count() == want["1"]
    # independent clean-room reader agrees end-to-end
    assert len(indie.read_rows(t)) == n + 1


def test_rename_gate_existing_name(mapped_table):
    t, _ = mapped_table
    with pytest.raises(delta_log.DeltaColumnMappingError):
        delta_log.rename_column(t, "o_totalprice", "status")


# --------------------------------------------------------------------------
# Type widening (protocol typeWidening): int→long / float→double
# --------------------------------------------------------------------------


def _mixed(spark):
    return spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)], "id long, small int, ratio float"
    )


def test_delta_widen_metadata_only_and_reads_wide(spark, tmp_path):
    t = str(tmp_path / "delta_widen")
    delta_log.create(_mixed(spark), t, stat_cols=["small"])
    before = set(delta_log.snapshot_files(t, 0))
    delta_log.widen_column(t, "small", "long")
    delta_log.widen_column(t, "ratio", "double")
    assert set(delta_log.snapshot_files(t)) == before
    wide = spark.createDataFrame(
        [(3, 2**40, 3.5)], "id long, small long, ratio double"
    )
    delta_log.append(wide, t, stat_cols=["small"])
    got = delta_log.read_delta(spark, t)
    assert dict(got.dtypes)["small"] == "bigint"
    assert dict(got.dtypes)["ratio"] == "double"
    assert sorted((r.id, r.small, r.ratio) for r in got.collect()) == [
        (1, 10, 1.5), (2, 20, 2.5), (3, 2**40, 3.5)
    ]
    # stats pruning across the promotion boundary (JSON stats are
    # type-agnostic): the narrow range plans only the old file
    lo = delta_log.scan_pruned(spark, t, "small", 5, 25)
    assert sorted(r.small for r in lo.collect()) == [10, 20]
    hit = delta_log.scan_pruned(spark, t, "small", 2**39, 2**41)
    assert [r.small for r in hit.collect()] == [2**40]
    # time travel keeps the narrow type
    assert dict(delta_log.read_delta(spark, t, 0).dtypes)["small"] == "int"
    # independent reader agrees
    assert sorted(r[1] for r in indie.read_rows(t)) == [10, 20, 2**40]


def test_delta_widen_gates(spark, tmp_path):
    t = str(tmp_path / "delta_widen_gate")
    delta_log.create(_mixed(spark), t)
    with pytest.raises(ValueError, match="not a sanctioned promotion"):
        delta_log.widen_column(t, "small", "double")
    # partition columns widen too (round 8 — the old gate is lifted):
    # int→long partitionValues strings are already canonical
    t2 = str(tmp_path / "delta_widen_part")
    delta_log.create(
        _mixed(spark).withColumn("p", (F.col("id") % 2).cast("int")),
        t2,
        partition_by=["p"],
    )
    delta_log.widen_column(t2, "p", "long")
    got = delta_log.read_delta(spark, t2)
    assert dict(got.dtypes)["p"] == "bigint"
    assert sorted(r.p for r in got.collect()) == [0, 1]
    assert delta_log.scan_partitions(spark, t2, {"p": 1}).count() == 1


def test_delta_widen_composes_with_column_mapping(spark, tmp_path):
    t = str(tmp_path / "delta_widen_map")
    delta_log.create(_mixed(spark), t)
    delta_log.widen_column(t, "small", "long")
    delta_log.rename_column(t, "small", "counter")
    wide = spark.createDataFrame(
        [(9, 2**35, 9.5)], "id long, counter long, ratio float"
    )
    delta_log.append(wide, t)
    got = delta_log.read_delta(spark, t)
    assert dict(got.dtypes)["counter"] == "bigint"
    assert sorted(r.counter for r in got.collect()) == [10, 20, 2**35]
    assert sorted(r[1] for r in indie.read_rows(t)) == [10, 20, 2**35]
