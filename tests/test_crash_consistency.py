"""Crash-consistency fault injection for both lake layers: a writer
that dies BEFORE its commit point must leave the table unreadable-ly
unchanged — stray data files, staging leftovers, and unlinked .tmp
commit files are invisible to readers (log/metadata-planned scans never
list directories) and reclaimable by the maintenance ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg

from tests import delta_reader_independent as d_indie
from tests import iceberg_reader_independent as i_indie


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, val double")


ROWS = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]


def _plant_stray_parquet(spark, target_dir):
    """A data file a crashed writer staged but never committed."""
    stray_src = target_dir + "_straybuild"
    _df(spark, [(999, "stray", 9.9)]).coalesce(1).write.mode("overwrite").parquet(
        stray_src
    )
    part = next(
        f for f in os.listdir(stray_src) if f.endswith(".parquet")
    )
    os.makedirs(target_dir, exist_ok=True)
    dst = os.path.join(target_dir, "part-deadbeef-crashed.snappy.parquet")
    os.rename(os.path.join(stray_src, part), dst)
    return dst


def test_iceberg_stray_data_file_invisible_then_reclaimed(spark, tmp_path):
    t = str(tmp_path / "ice_crash")
    iceberg.create(_df(spark, ROWS), t)
    stray = _plant_stray_parquet(spark, os.path.join(t, "data"))
    # both readers plan from manifests — the stray file never surfaces
    assert sorted(tuple(r) for r in iceberg.read_iceberg(spark, t).collect()) == ROWS
    assert sorted(i_indie.read_rows(t)) == ROWS
    removed = iceberg.remove_orphan_files(t, older_than_ms=0)
    assert os.path.relpath(stray, t) in removed
    assert not os.path.exists(stray)
    assert sorted(i_indie.read_rows(t)) == ROWS


def test_iceberg_unlinked_tmp_metadata_ignored(spark, tmp_path):
    t = str(tmp_path / "ice_tmpmeta")
    iceberg.create(_df(spark, ROWS), t)
    v = iceberg.current_version(t)
    # a crashed commit leaves its temp file but never linked the
    # canonical vN name — version resolution and reads ignore it
    meta_dir = os.path.join(t, "metadata")
    with open(os.path.join(meta_dir, f"v{v + 1}.metadata.json.tmpdead"), "w") as f:
        f.write("{garbage")
    assert iceberg.current_version(t) == v
    assert sorted(tuple(r) for r in iceberg.read_iceberg(spark, t).collect()) == ROWS
    # and the NEXT commit still claims v+1 normally
    iceberg.append(_df(spark, [(4, "d", 4.0)]), t)
    assert iceberg.current_version(t) == v + 1


def test_delta_stray_data_file_invisible_then_vacuumed(spark, tmp_path):
    t = str(tmp_path / "delta_crash")
    delta_log.create(_df(spark, ROWS), t)
    stray = _plant_stray_parquet(spark, t)
    assert sorted(tuple(r) for r in delta_log.read_delta(spark, t).collect()) == ROWS
    assert sorted(d_indie.read_rows(t)) == ROWS
    removed = delta_log.vacuum(t, retention_ms=0)
    assert os.path.relpath(stray, t) in removed
    assert not os.path.exists(stray)
    assert sorted(d_indie.read_rows(t)) == ROWS


def test_delta_unlinked_tmp_commit_ignored(spark, tmp_path):
    t = str(tmp_path / "delta_tmpcommit")
    delta_log.create(_df(spark, ROWS), t)
    v = delta_log.latest_version(t)
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{v + 1:020d}.json.deadtmp"), "w") as f:
        f.write('{"add": {"path": "phantom.parquet"}}')
    assert delta_log.latest_version(t) == v
    assert sorted(tuple(r) for r in delta_log.read_delta(spark, t).collect()) == ROWS
    delta_log.append(_df(spark, [(4, "d", 4.0)]), t)
    assert delta_log.latest_version(t) == v + 1
    assert len(d_indie.read_rows(t)) == 4


def test_iceberg_staging_leftover_from_crashed_optimize(spark, tmp_path):
    """A compaction that died mid-staging leaves a _staging_* dir; reads
    and later commits are unaffected and orphan cleanup reclaims it."""
    t = str(tmp_path / "ice_staging")
    iceberg.create(_df(spark, ROWS), t)
    staging = os.path.join(t, "_staging_deadbeef")
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "part-000.parquet"), "wb") as f:
        f.write(b"not parquet at all")
    assert sorted(tuple(r) for r in iceberg.read_iceberg(spark, t).collect()) == ROWS
    iceberg.append(_df(spark, [(4, "d", 4.0)]), t)
    assert len(i_indie.read_rows(t)) == 4


def test_rewrite_position_deletes_consolidates_and_preserves(spark, tmp_path):
    """Three DELETE commits accumulate three tombstone files; the
    rewrite consolidates them into ONE, drops tombstones of dead data
    files, keeps equality deletes applying with their original sequence
    numbers, and changes no visible row — both readers agree, and time
    travel to the pre-rewrite snapshot still serves the same rows."""
    t = str(tmp_path / "ice_rewrite_dels")
    rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(12)]
    iceberg.create(_df(spark, rows), t)
    iceberg.delete_where(spark, t, "id = 0")
    iceberg.delete_where(spark, t, "id = 3")
    # an equality delete in the mix (must survive with its sequence rule)
    iceberg.delete_by_equality(
        spark, t, spark.createDataFrame([(6,)], "id long")
    )
    # a row re-appended AFTER the equality delete must keep living
    iceberg.append(_df(spark, [(6, "z", 66.0)]), t)
    iceberg.delete_where(spark, t, "id = 9")
    pre = iceberg.current_metadata(t)["current-snapshot-id"]
    expected = sorted(tuple(r) for r in iceberg.read_iceberg(spark, t).collect())
    assert len(iceberg.snapshot_delete_files(t)) == 3

    sid = iceberg.rewrite_position_deletes(spark, t)
    assert sid != pre
    assert len(iceberg.snapshot_delete_files(t)) == 1  # consolidated
    got = sorted(tuple(r) for r in iceberg.read_iceberg(spark, t).collect())
    assert got == expected
    assert sorted(i_indie.read_rows(t)) == expected
    # the re-appended id=6 row survived the carried-over equality delete
    assert (6, "z", 66.0) in got and (6, "a", 6.0) not in got
    # time travel to the pre-rewrite snapshot unchanged
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, t, pre).collect()
    ) == expected
    # idempotent: a second rewrite is a no-op
    assert iceberg.rewrite_position_deletes(spark, t) == sid


def test_vacuum_dv_sidecars_live_kept_orphans_swept(spark, tmp_path):
    """The executor-side DELETE writes per-task DV sidecars; a retried
    task can orphan one. VACUUM must sweep unreferenced
    deletion_vector_*.bin (mtime past retention) while every sidecar
    referenced by ANY commit — current or time-travelable — survives."""
    import glob
    import os

    from pyspark.sql import functions as F

    from march_mania_spark_lakehouse_spark.sources import delta_log

    t = str(tmp_path / "dv_vac")
    delta_log.create(
        spark.range(0, 100).select(
            "id", (F.col("id") % 5).alias("g")
        ).repartition(4),
        t,
    )
    delta_log.delete_where(spark, t, "id % 10 = 0")
    live_sidecars = set(glob.glob(os.path.join(t, "deletion_vector_*.bin")))
    assert live_sidecars  # the delete produced at least one
    # plant an orphan (a crashed/retried task's debris), aged past
    # retention
    orphan = os.path.join(t, "deletion_vector_00000000000000000000000000000000.bin")
    with open(orphan, "wb") as f:
        f.write(b"\x01junkjunkjunk")
    old = 10_000
    os.utime(orphan, (old, old))
    for p in live_sidecars:  # age the LIVE ones too: retention alone
        os.utime(p, (old, old))  # must not justify deleting them
    deleted = delta_log.vacuum(t, retention_ms=0)
    assert os.path.basename(orphan) in deleted
    assert not os.path.exists(orphan)
    for p in live_sidecars:
        assert os.path.exists(p), f"live DV sidecar {p} was vacuumed"
    # table still reads through its DVs, both readers
    assert delta_log.read_delta(spark, t).count() == 90
    from tests import delta_reader_independent as indie

    assert len(indie.read_rows(t)) == 90
