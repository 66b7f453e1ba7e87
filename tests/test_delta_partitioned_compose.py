"""Delta advanced features × PARTITIONED tables — the round-6 verdict's
composition wall, now first-class: shallow clone of partitioned
sources, clones over live deletion vectors, column mapping with
partition-column renames, and the full stack at once (partitioned →
rename → clone → delete on the clone). Every scenario is cross-checked
by the independent clean-room reader.

The enabling design: add-action ``partitionValues`` (keyed by PHYSICAL
column names) are authoritative — the read path's physical-name-aware
branch restores partition columns from the log, so hive directories
under a foreign root (clones) and renamed logical names (mapping) never
matter.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log

from tests import delta_reader_independent as indie


def _part_df(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 2.0).alias("val"),
    )


def test_shallow_clone_partitioned_source(spark, tmp_path):
    t = str(tmp_path / "src_part")
    c = str(tmp_path / "clone_part")
    delta_log.create(_part_df(spark, 0, 200), t, partition_by=["g"], stat_cols=["id"])
    delta_log.append(_part_df(spark, 200, 240), t, stat_cols=["id"])
    delta_log.shallow_clone(t, c)
    got = delta_log.read_delta(spark, c)
    assert got.count() == 240
    # partition column restored from the LOG on the clone (absolute
    # paths defeat hive discovery), values and types intact
    assert dict(got.dtypes)["g"] == "string"
    counts = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"0": 60, "1": 60, "2": 60, "3": 60}
    # log-planned partition pruning works on the clone
    assert delta_log.scan_partitions(spark, c, {"g": "2"}).count() == 60
    # writes diverge: delete one partition on the clone only
    delta_log.delete_where(spark, c, "g = '3'")
    assert delta_log.read_delta(spark, c).count() == 180
    assert delta_log.read_delta(spark, t).count() == 240
    assert len(indie.read_rows(c)) == 180
    assert len(indie.read_rows(t)) == 240


def test_shallow_clone_partitioned_with_live_dvs(spark, tmp_path):
    t = str(tmp_path / "src_part_dv")
    c = str(tmp_path / "clone_part_dv")
    delta_log.create(_part_df(spark, 0, 100), t, partition_by=["g"])
    delta_log.delete_where(spark, t, "id % 10 = 0")  # live DVs in source
    delta_log.shallow_clone(t, c)
    got = delta_log.read_delta(spark, c)
    assert got.count() == 90
    assert got.filter(F.col("id") % 10 == 0).count() == 0
    assert sorted(r.id for r in got.collect()) == sorted(
        i for i in range(100) if i % 10
    )
    assert len(indie.read_rows(c)) == 90


def test_partitioned_rename_clone_scan_roundtrip(spark, tmp_path):
    """The verdict's target composition: partitioned table → rename
    column → shallow clone → scan; clone equals source row-for-row
    under the renamed schema, for both readers."""
    t = str(tmp_path / "src_prc")
    c = str(tmp_path / "clone_prc")
    delta_log.create(_part_df(spark, 0, 120), t, partition_by=["g"])
    delta_log.rename_column(t, "val", "score")
    delta_log.rename_column(t, "g", "grp")
    delta_log.shallow_clone(t, c)
    src = sorted(tuple(r) for r in delta_log.read_delta(spark, t).collect())
    cln = sorted(tuple(r) for r in delta_log.read_delta(spark, c).collect())
    assert src == cln and len(src) == 120
    assert delta_log.read_delta(spark, c).columns == ["id", "grp", "score"]
    assert sorted(indie.read_rows(c)) == src
    # mapping rides into the clone: rename further on the CLONE only
    delta_log.rename_column(c, "score", "points")
    assert delta_log.read_delta(spark, c).columns == ["id", "grp", "points"]
    assert delta_log.read_delta(spark, t).columns == ["id", "grp", "score"]


def test_partition_column_drop_refused(spark, tmp_path):
    t = str(tmp_path / "src_dropgate")
    delta_log.create(_part_df(spark, 0, 40), t, partition_by=["g"])
    with pytest.raises(delta_log.DeltaColumnMappingError, match="partition column"):
        delta_log.drop_column(t, "g")


def test_partitioned_mapped_update_and_cdc_roundtrip(spark, tmp_path):
    """UPDATE (DV delete + append) on a partitioned, column-mapped
    table: images land in the right partitions and the row count is
    stable."""
    t = str(tmp_path / "src_part_upd")
    delta_log.create(_part_df(spark, 0, 80), t, partition_by=["g"])
    delta_log.rename_column(t, "val", "score")
    delta_log.update_where(
        spark, t, "g = '1'", {"score": F.col("score") + 1000.0}
    )
    got = delta_log.read_delta(spark, t)
    assert got.count() == 80
    assert got.filter((F.col("g") == "1") & (F.col("score") < 1000.0)).count() == 0
    assert got.filter((F.col("g") != "1") & (F.col("score") >= 1000.0)).count() == 0
    assert len(indie.read_rows(t)) == 80


def test_cdc_on_partitioned_clone_and_dv_carrying_adds(spark, tmp_path):
    """Two review-confirmed composition bugs, pinned:

    1. table_changes(include_deletes=True) on a partitioned shallow
       clone must not relpath the clone's absolute add paths (that
       defeated the physical-name scan branch — basePath crash /
       NULL partition columns);
    2. an add CARRYING a deletion vector (clone v0) contributes only
       its LIVE rows as inserts — emitting the tombstoned positions
       with no compensating delete would resurrect them in any
       downstream materialization."""
    from collections import Counter

    src = str(tmp_path / "cdc_src")
    clone = str(tmp_path / "cdc_clone")
    delta_log.create(_part_df(spark, 0, 40), src, partition_by=["g"])
    delta_log.delete_where(spark, src, "id % 4 = 0")  # live DVs in source
    delta_log.shallow_clone(src, clone)
    delta_log.delete_where(spark, clone, "g = '1'")

    ch = delta_log.table_changes(spark, clone, -1, include_deletes=True)
    rows = ch.collect()
    ins = [r for r in rows if r._change_type == "insert"]
    dels = [r for r in rows if r._change_type == "delete"]
    # inserts: the clone's v0 LIVE rows (40 minus the 10 source-dead)
    assert sorted(r.id for r in ins) == [i for i in range(40) if i % 4]
    # deletes: partition '1' (g = id % 4; disjoint from the source-dead
    # id % 4 == 0 rows, so all of them are live at clone time)
    assert sorted(r.id for r in dels) == [
        i for i in range(40) if i % 4 == 1
    ]
    # partition column restored on BOTH change types
    assert all(r.g is not None for r in rows)
    # signed fold reproduces the head snapshot
    state = Counter()
    for r in rows:
        state[(r.id, r.g, r.val)] += 1 if r._change_type == "insert" else -1
    head = Counter(
        tuple(r) for r in delta_log.read_delta(spark, clone).collect()
    )
    assert +state == head

    # same contract through the STREAMING CDC source
    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        _DeltaTableCdcStreamReader,
    )

    srows = _DeltaTableCdcStreamReader({"path": clone})._changes(
        -1, delta_log.latest_version(clone)
    )
    sstate = Counter()
    for t in srows:
        sstate[t[:-1]] += 1 if t[-1] == "insert" else -1
    assert +sstate == head


def test_special_char_partition_values_roundtrip(spark, tmp_path):
    """Hive-escaped partition dirs (':' → %3A, '%' → %25) compose with
    the log-planned layers: partitionValues store the RAW value (spec),
    the URI-encoded _metadata.file_path decodes back to the on-disk
    path so DV tombstones and partition restoration join correctly —
    under column mapping (log-join restore) AND after a DV delete."""
    t = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, "x:y", 1.0), (2, "plain", 2.0), (3, "a b%c", 3.0), (4, "x:y", 4.0)],
        "id long, g string, val double",
    )
    delta_log.create(df, t, partition_by=["g"])
    # raw values in the log
    live = delta_log._replay(t, 0)
    stored = {a["partitionValues"]["g"] for a in live.values()}
    assert stored == {"x:y", "plain", "a b%c"}
    assert sorted(tuple(r) for r in delta_log.read_delta(spark, t).collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # column mapping flips reads onto the log-join restoration path
    delta_log.rename_column(t, "val", "score")
    got = delta_log.read_delta(spark, t)
    assert got.filter(F.col("g").isNull()).count() == 0
    assert {r.g for r in got.collect()} == {"x:y", "plain", "a b%c"}
    # DV delete inside an escaped partition dir: exactly those rows die
    delta_log.delete_where(spark, t, "g = 'x:y'")
    after = delta_log.read_delta(spark, t)
    assert sorted(r.id for r in after.collect()) == [2, 3]
    assert len(indie.read_rows(t)) == 2
    # log-planned pruning by the raw value
    assert delta_log.scan_partitions(spark, t, {"g": "a b%c"}).count() == 1
