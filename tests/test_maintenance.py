"""Lake maintenance: compaction and versioned snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.sources import maintenance as mt


def test_compaction_shrinks_file_count_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fragmented")
    orders = catalog.load(spark, "orders", sf_dir).limit(3000)
    orders.repartition(40).write.mode("overwrite").parquet(path)
    before_rows = spark.read.parquet(path).count()
    n_before, total = mt.dir_stats(path)
    assert n_before >= 40

    b, a = mt.compact(spark, path, target_file_bytes=max(total // 3, 1))
    assert b == n_before and a <= 4
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    # content identical, not just count
    assert after.exceptAll(orders).count() == 0


def test_snapshot_publish_time_travel_rollback(spark, sf_dir, tmp_path):
    root = str(tmp_path / "versioned")
    ev = catalog.load(spark, "events", sf_dir).select("event_id", "value").limit(500)

    v0 = mt.write_snapshot(ev, root)
    v1 = mt.write_snapshot(ev.withColumn("value", F.col("value") * 2), root)
    assert (v0, v1) == (0, 1)
    assert mt.latest_version(root) == 1

    latest = mt.read_snapshot(spark, root)
    old = mt.read_snapshot(spark, root, version=0)
    s_new = latest.agg(F.sum("value")).first()[0]
    s_old = old.agg(F.sum("value")).first()[0]
    assert abs(s_new - 2 * s_old) < 1e-6

    mt.rollback(root, 0)
    assert mt.latest_version(root) == 0
    assert abs(mt.read_snapshot(spark, root).agg(F.sum("value")).first()[0] - s_old) < 1e-6


def test_manifest_pruned_scan_matches_full_filter(spark, sf_dir, tmp_path):
    """Iceberg-style read path on the snapshot layer: publish with
    stat_cols → per-file manifest lands with the version; a range scan
    planned from the manifest opens strictly fewer files yet returns
    exactly the full-scan+filter rows."""
    root = str(tmp_path / "lake")
    orders = catalog.load(spark, "orders", sf_dir)
    # range-cluster on the stat column so per-file [min,max] are disjoint
    # (what a lakehouse writer does so skipping has teeth)
    clustered = orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    v = mt.write_snapshot(clustered, root, stat_cols=["o_orderkey"])

    mf = mt.read_manifest(spark, root)
    n_files, _ = mt.dir_stats(mt._version_dir(root, v))
    assert mf.count() == n_files >= 8  # one manifest row per data file
    # the manifest dir must be invisible to the data scan
    assert mt.read_snapshot(spark, root).columns == orders.columns

    lo, hi = 1000, 5000
    pruned = mt.scan_pruned(spark, root, "o_orderkey", lo, hi)
    full = mt.read_snapshot(spark, root).filter(
        F.col("o_orderkey").between(lo, hi)
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
    assert pruned.count() == full.count() > 0

    # skipping has teeth: the planned file set is a strict subset
    from march_mania_spark_lakehouse_spark.operators.sketch import prune_files

    kept = prune_files(mf, "o_orderkey", lo, hi).count()
    assert 0 < kept < n_files
    # and the executed scan really only touched the kept files
    touched = (
        pruned.select(
            F.regexp_extract(F.input_file_name(), "([^/]+)$", 1).alias("f")
        )
        .distinct()
        .count()
    )
    assert touched <= kept

    # an empty-overlap range opens nothing and returns nothing
    assert mt.scan_pruned(spark, root, "o_orderkey", -500, -1).count() == 0


def test_manifest_versions_are_independent(spark, sf_dir, tmp_path):
    """Each version carries its own manifest (time travel includes the
    planning metadata), and un-stat'd versions say so loudly."""
    import pytest

    root = str(tmp_path / "lake2")
    ev = catalog.load(spark, "events", sf_dir).select("event_id", "value")
    v0 = mt.write_snapshot(ev.filter(F.col("event_id") < 100), root, stat_cols=["event_id"])
    v1 = mt.write_snapshot(ev, root, stat_cols=["event_id"])
    hi0 = mt.read_manifest(spark, root, v0).agg(F.max("max_event_id")).first()[0]
    hi1 = mt.read_manifest(spark, root, v1).agg(F.max("max_event_id")).first()[0]
    assert hi0 < 100 <= hi1
    v2 = mt.write_snapshot(ev.limit(10), root)  # no stats requested
    with pytest.raises(FileNotFoundError, match="without stat_cols"):
        mt.read_manifest(spark, root, v2)


def test_analyze_table_records_cbo_stats(spark, sf_dir, tmp_path):
    """ANALYZE must record table rowCount/sizeInBytes and per-column ndv
    in the catalog, and the logical plan must pick the stats up (CBO's
    planning input: exact rowCount instead of a size guess)."""
    from march_mania_spark_lakehouse_spark import catalog as cat
    from march_mania_spark_lakehouse_spark.sources.maintenance import analyze_table

    tbl = "orders_stats_test"
    cat.load(spark, "orders", sf_dir).write.mode("overwrite").saveAsTable(tbl)
    try:
        n = spark.table(tbl).count()
        stats = analyze_table(spark, tbl, columns=["o_orderstatus", "o_custkey"])
        assert stats["rowCount"] == n
        assert stats["sizeInBytes"] and stats["sizeInBytes"] > 0
        ndv = int(stats["columns"]["o_orderstatus"]["distinct_count"])
        assert 1 <= ndv <= 4  # 3 statuses ± HLL estimation slack
        # with CBO on, the optimizer sees the analyzed rowCount on the
        # relation (without it, plans only carry a sizeInBytes guess)
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            plan_stats = (
                spark.table(tbl)._jdf.queryExecution().optimizedPlan().stats()
            )
            assert plan_stats.rowCount().get() == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_vacuum_retains_published_and_newest(spark, sf_dir, tmp_path):
    """vacuum(keep_last=2) after 5 publishes drops v0..v2; after a
    rollback to an old version, vacuum must keep the published version
    even though it is outside the newest-2 window."""
    from march_mania_spark_lakehouse_spark import catalog as cat
    from march_mania_spark_lakehouse_spark.sources.maintenance import (
        read_snapshot,
        retained_versions,
        rollback,
        vacuum,
        write_snapshot,
    )

    root = str(tmp_path / "snap")
    df = cat.load(spark, "region", sf_dir)
    for i in range(5):
        write_snapshot(df.withColumn("v", F.lit(i)), root)

    removed = vacuum(root, keep_last=2)
    assert removed == [0, 1, 2]
    assert retained_versions(root) == [3, 4]
    assert read_snapshot(spark, root).select("v").first().v == 4

    # grow to v5/v6, roll back to v3, vacuum keep_last=1: the published
    # v3 must survive alongside the newest v6
    write_snapshot(df.withColumn("v", F.lit(5)), root)
    write_snapshot(df.withColumn("v", F.lit(6)), root)
    rollback(root, 3)
    removed = vacuum(root, keep_last=1)
    assert 3 not in removed
    assert set(retained_versions(root)) == {3, 6}
    assert read_snapshot(spark, root).select("v").first().v == 3


def test_publish_after_rollback_branches_forward(spark, sf_dir, tmp_path):
    """Publishing after a rollback must allocate above every retained
    version (v3 published, v4 retained -> next is v5), never overwrite."""
    from march_mania_spark_lakehouse_spark import catalog as cat
    from march_mania_spark_lakehouse_spark.sources.maintenance import (
        read_snapshot,
        retained_versions,
        rollback,
        write_snapshot,
    )

    root = str(tmp_path / "snap_branch")
    df = cat.load(spark, "region", sf_dir)
    for i in range(5):
        write_snapshot(df.withColumn("v", F.lit(i)), root)
    rollback(root, 3)
    v = write_snapshot(df.withColumn("v", F.lit(99)), root)
    assert v == 5  # above the retained v4, not pointer+1 == 4
    assert retained_versions(root) == [0, 1, 2, 3, 4, 5]
    # v4's original content is untouched
    assert read_snapshot(spark, root, version=4).select("v").first().v == 4
    assert read_snapshot(spark, root).select("v").first().v == 99


def test_cleanup_metadata_keeps_current_surface(spark, tmp_path):
    """write.metadata.previous-versions-max maintenance: old
    vN.metadata.json generations are deleted, the current pointer
    (version-hint), snapshot time travel, scans and the clean-room
    reader all keep working."""
    import os

    from march_mania_spark_lakehouse_spark.sources import iceberg
    from tests import iceberg_reader_independent as iindep

    t = str(tmp_path / "meta_clean")
    iceberg.create(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), t
    )
    for i in range(2, 7):
        iceberg.append(
            spark.createDataFrame([(i, float(i))], "id long, v double"), t
        )
    first_snap = iceberg.snapshot_ids(t)[0]
    cur = iceberg.current_version(t)
    deleted = iceberg.cleanup_metadata(t, keep_last=2)
    assert deleted == [f"v{v}.metadata.json" for v in range(1, cur - 1)]
    assert not os.path.exists(
        os.path.join(t, "metadata", "v1.metadata.json")
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, t).collect())
    assert got == [1, 2, 3, 4, 5, 6]
    # snapshot time travel is metadata-internal: unaffected
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, t, first_snap).collect()
    ) == [1]
    assert len(iindep.read_rows(t)) == 6
