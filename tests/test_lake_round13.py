"""Round-13 lake layer, part 1: the round-12 advisor fixes.

- sync_to_delta's sid-less-cursor fallback anchors ONLY on an exact
  sequence hit; walking below the cursor (the snapshot rolled off the
  ancestry and then expired) raises re-convert instead of silently
  replaying parent-diffs onto the mirror's cursor-image state.
- `_register_partition_spec` reuses an EQUIVALENT existing spec
  instead of minting a new id — layout flip-flops don't grow
  partition-specs unboundedly.
- Full rewrites (REPLACE PARTITIONED BY / OPTIMIZE) default their
  stat set to the columns the live adds already carry min/max for —
  a relayout doesn't silently drop data-skipping stats.
- A delete manifest that PARTIALLY governs after a selective optimize
  (some references packed away, some surviving) is rewritten with
  only the governing entries — no stale DV debris in
  `position_deletes` / `delete_files`.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log, iceberg


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val double")


def _rows(n, lo=0):
    return [(i, i % 3, float(i)) for i in range(lo, lo + n)]


def _strip_cursor_sid(delta_table: str) -> None:
    """Doctor the mirror's newest sync commit into the sid-less shape
    metadata-only sync commits write (sourceSequence without
    sourceSnapshotId)."""
    v = delta_log.latest_version(delta_table)
    p = delta_log._commit_path(delta_table, v)
    with open(p) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    hit = False
    for a in actions:
        params = a.get("commitInfo", {}).get("operationParameters", {})
        if params.pop("sourceSnapshotId", None) is not None:
            hit = True
    assert hit, "no sourceSnapshotId found to strip"
    with open(p, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_sync_sidless_cursor_linear_still_replays(spark, tmp_path):
    """The legit fallback: a sid-less cursor whose snapshot is retained
    ON the ancestry (exact sequence hit) keeps the linear replay."""
    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(6)), it, format_version=3)
    iceberg.convert_to_delta(it, dt)
    _strip_cursor_sid(dt)
    iceberg.append(_df(spark, [(100, 0, 1.0)]), it)
    iceberg.sync_to_delta(it, dt)
    assert sorted(
        r.id for r in delta_log.read_delta(spark, dt).collect()
    ) == sorted(list(range(6)) + [100])


def test_sync_sidless_cursor_rolled_off_and_expired_raises(
    spark, tmp_path
):
    """The advisor's divergence: sid-less cursor (seq-only), cursor
    snapshot rolled off the main ancestry AND expired. The old
    'sequence-number <= cursor' anchor landed on the rollback-target
    ancestor and silently kept the rolled-off rows on the mirror; now
    it raises re-convert."""
    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(4)), it, format_version=3)  # A seq 1
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, [(100, 0, -1.0)]), it)  # B seq 2
    iceberg.sync_to_delta(it, dt)  # cursor = B
    _strip_cursor_sid(dt)
    # drop the auto-managed cursor tag: this repro needs the cursor
    # GENUINELY expired (the tag protection has its own tests)
    for name in list(iceberg.current_metadata(it).get("refs", {})):
        if name.startswith("sync-cursor-"):
            iceberg.drop_ref(it, name)
    iceberg.rollback_to_snapshot(it, good)  # B off-ancestry
    iceberg.append(_df(spark, [(200, 1, 2.0)]), it)  # C seq 3
    iceberg.expire_snapshots(it, keep_last=2)  # A + C stay, B expires
    assert len(iceberg.current_metadata(it)["snapshots"]) == 2
    before = delta_log.latest_version(dt)
    with pytest.raises(ValueError, match="re-convert"):
        iceberg.sync_to_delta(it, dt)
    # the mirror log is untouched — no silently-diverged commit was
    # written (the old behavior replayed A→C onto the B-image state)
    assert delta_log.latest_version(dt) == before


def test_partition_spec_reuse_on_layout_flip_flop(spark, tmp_path):
    """Registering a spec identical to an existing one reuses its id
    (reference Iceberg behavior): day→hour→day→hour settles at TWO
    specs however often the layout toggles."""
    t = str(tmp_path / "flip")
    df = spark.range(20).selectExpr(
        "id",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id,0,0)"
        " as ts",
    )
    iceberg.create(df, t, partition_by=["day(ts)"])
    s1 = iceberg.evolve_partition_spec(t, ["hour(ts)"])
    s2 = iceberg.evolve_partition_spec(t, ["day(ts)"])
    s3 = iceberg.evolve_partition_spec(t, ["hour(ts)"])
    meta = iceberg.current_metadata(t)
    assert s2 == 0 and s3 == s1 == 1
    assert len(meta["partition-specs"]) == 2
    assert meta["default-spec-id"] == s1
    # registering the CURRENT default again is a pure no-op
    assert iceberg.evolve_partition_spec(t, ["hour(ts)"]) == s1
    assert len(iceberg.current_metadata(t)["partition-specs"]) == 2


def test_delta_repartition_preserves_skipping_stats(spark, tmp_path):
    """REPLACE PARTITIONED BY without explicit stat_cols keeps the
    stat column set the live adds carried — data skipping survives the
    relayout by default."""
    t = str(tmp_path / "restat")
    delta_log.create(
        _df(spark, _rows(12)).repartitionByRange(2, "id"),
        t,
        stat_cols=["id", "val"],
    )
    delta_log.repartition_table(spark, t, ["k"])
    adds = delta_log._replay(t, delta_log.latest_version(t)).values()
    stat_sets = [
        set((json.loads(a["stats"]).get("minValues") or {}))
        for a in adds
        if a.get("stats")
    ]
    assert stat_sets and all("id" in s and "val" in s for s in stat_sets)
    # and skipping still prunes post-relayout
    pruned = delta_log.scan_pruned(spark, t, "id", 0, 1)
    assert sorted(r.id for r in pruned.collect()) == [0, 1]
    assert len(pruned.inputFiles()) < len(delta_log.snapshot_files(t))


def test_delta_optimize_preserves_skipping_stats(spark, tmp_path):
    """OPTIMIZE without stat_cols/zorder keeps the live adds' stat
    column set instead of dropping stats from the compacted files."""
    t = str(tmp_path / "optstat")
    delta_log.create(
        _df(spark, _rows(10)).repartitionByRange(2, "id"),
        t,
        stat_cols=["id"],
    )
    delta_log.optimize(spark, t, target_files=1)
    adds = list(
        delta_log._replay(t, delta_log.latest_version(t)).values()
    )
    assert adds and all(
        "id" in (json.loads(a["stats"]).get("minValues") or {})
        for a in adds
        if a.get("stats")
    )
    assert any(a.get("stats") for a in adds)


def test_optimize_rewrites_partially_governing_delete_manifest(
    spark, tmp_path
):
    """ONE delete commit tombstones rows in a small file AND the big
    file; a selective optimize packs the small files away. The delete
    manifest still governs the big file, but its small-file DV entry
    is dead — the manifest must be rewritten with only the surviving
    entry, keeping `position_deletes` / `delete_files` truthful."""
    t = str(tmp_path / "partial")
    iceberg.create(_df(spark, _rows(200)).coalesce(1), t, format_version=3)
    iceberg.append(_df(spark, _rows(3, lo=1000)).coalesce(1), t)
    iceberg.append(_df(spark, _rows(3, lo=2000)).coalesce(1), t)
    # one commit, DVs on the big file (id=5) and a small file (id=1001)
    iceberg.delete_where(spark, t, "id IN (5, 1001)")
    pdl = iceberg.metadata_table(spark, t, "position_deletes").collect()
    assert len(pdl) == 2
    big_size = max(
        r.file_size_in_bytes
        for r in iceberg.metadata_table(spark, t, "files").collect()
    )
    iceberg.optimize(spark, t, small_file_bytes=big_size)
    live = {
        r.file_path
        for r in iceberg.metadata_table(spark, t, "files").collect()
    }
    pdl = iceberg.metadata_table(spark, t, "position_deletes").collect()
    # only the surviving file's DV remains; the packed file's entry is
    # rewritten away, not carried as debris
    assert len(pdl) == 1 and pdl[0].file_path in live
    dfl = iceberg.metadata_table(spark, t, "delete_files").collect()
    assert len(dfl) == 1
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, t).collect()
    ) == sorted(
        set(range(200)) - {5}
        | set(range(1000, 1003)) - {1001}
        | set(range(2000, 2003))
    )
    from tests import iceberg_reader_independent as ice_indep

    assert len(ice_indep.read_rows(t)) == 200 - 1 + 3 - 1 + 3


# ---------------------------------------------------------------------------
# Round-12 verdict #1: Iceberg identity-spec relayout (repartition_table)
# and its replay onto the Delta mirror.
# ---------------------------------------------------------------------------


def test_iceberg_repartition_table_round_trip(spark, tmp_path):
    """Writer-side identity relayout [] → [k] → []: reads stay exact
    at every step, v3 lineage survives, partition pruning works under
    the new layout, time travel reads pre-relayout snapshots under
    THEIR identity set, and equivalent specs reuse their ids."""
    from tests import iceberg_reader_independent as ice_indep

    t = str(tmp_path / "rt")
    iceberg.create(_df(spark, _rows(12)).coalesce(1), t, format_version=3)
    pre_sid = iceberg.current_metadata(t)["current-snapshot-id"]
    iceberg.delete_where(spark, t, "id = 5")
    iceberg.repartition_table(spark, t, ["k"])
    want = sorted((i, i % 3, float(i)) for i in range(12) if i != 5)
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, t).collect()
    ) == want
    assert sorted(ice_indep.read_rows(t)) == want
    # the relayout materialized the DV: no delete files in the head
    assert iceberg.metadata_table(spark, t, "delete_files").count() == 0
    # pruning on the new layout plans a strict subset of files
    pr = iceberg.scan_partition(spark, t, {"k": 1})
    assert sorted(r.id for r in pr.collect()) == [1, 4, 7, 10]
    assert len(pr.inputFiles()) < len(iceberg.snapshot_files(t))
    # time travel: the pre-relayout snapshot reads under identity []
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, t, pre_sid).collect()
    ) == list(range(12))
    # appends land under the new spec; flip back reuses spec 0
    iceberg.append(_df(spark, [(100, 2, 9.0)]), t)
    iceberg.repartition_table(spark, t, [])
    meta = iceberg.current_metadata(t)
    assert meta["default-spec-id"] == 0
    assert len(meta["partition-specs"]) == 2
    want = sorted(
        [(i, i % 3, float(i)) for i in range(12) if i != 5]
        + [(100, 2, 9.0)]
    )
    assert sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, t).collect()
    ) == want
    assert sorted(ice_indep.read_rows(t)) == want


def test_iceberg_repartition_is_feed_invisible(spark, tmp_path):
    """The relayout commit is operation='replace': change feeds skip
    it (rows are unchanged), like Delta's dataChange=false rule."""
    t = str(tmp_path / "feed")
    iceberg.create(_df(spark, _rows(6)).coalesce(1), t, format_version=3)
    lo = iceberg.current_metadata(t)["last-sequence-number"]
    iceberg.repartition_table(spark, t, ["k"])
    iceberg.append(_df(spark, [(50, 0, 1.0)]), t)
    got = sorted(
        r.id for r in iceberg.table_changes(spark, t, lo).collect()
    )
    assert got == [50]


def test_sync_to_delta_replays_identity_relayout(spark, tmp_path):
    """The mirror follows a writer-side relayout as ONE commit:
    metaData partitionColumns change + full hard-linked file swap.
    Old mirror versions stay time-travelable under their old layout;
    both clean-room readers agree at every sync point."""
    from tests import delta_reader_independent as d_indep

    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(12)).coalesce(1), it, format_version=3)
    iceberg.convert_to_delta(it, dt)
    v0 = delta_log.latest_version(dt)
    iceberg.repartition_table(spark, it, ["k"])
    iceberg.append(_df(spark, [(100, 1, 5.0)]), it)
    iceberg.sync_to_delta(it, dt)
    want = sorted(tuple(r) for r in iceberg.read_iceberg(spark, it).collect())
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    ) == want
    assert sorted(d_indep.read_rows(dt)) == want
    assert delta_log.table_partition_columns(dt) == ["k"]
    # mirror-side pruning works under the replayed layout
    pr = delta_log.scan_partitions(spark, dt, {"k": 1})
    assert sorted(r.id for r in pr.collect()) == [1, 4, 7, 10, 100]
    # pre-relayout mirror version still reads under the old layout
    assert sorted(
        r.id for r in delta_log.read_delta(spark, dt, v0).collect()
    ) == list(range(12))
    # flip back: the mirror follows again
    iceberg.repartition_table(spark, it, [])
    iceberg.append(_df(spark, [(200, 2, 6.0)]), it)
    iceberg.sync_to_delta(it, dt)
    want = sorted(tuple(r) for r in iceberg.read_iceberg(spark, it).collect())
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    ) == want
    assert sorted(d_indep.read_rows(dt)) == want
    assert delta_log.table_partition_columns(dt) == []


def test_sync_transform_spec_still_raises(spark, tmp_path):
    """Transform specs keep the honest raise — Delta has no hidden
    partitioning."""
    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(6)), it, format_version=3)
    iceberg.convert_to_delta(it, dt)
    iceberg.evolve_partition_spec(it, ["bucket(4, id)"])
    iceberg.append(_df(spark, [(50, 0, 1.0)]), it)
    with pytest.raises(NotImplementedError, match="transform"):
        iceberg.sync_to_delta(it, dt)


def test_evolve_identity_gate_points_to_repartition(spark, tmp_path):
    t = str(tmp_path / "gate")
    iceberg.create(_df(spark, _rows(4)), t)
    with pytest.raises(NotImplementedError, match="repartition_table"):
        iceberg.evolve_partition_spec(t, ["k"])


# ---------------------------------------------------------------------------
# Round-12 verdict #4: the sync cursor survives routine maintenance —
# an auto-managed `sync-cursor-*` tag keeps the last-synced snapshot
# retained until the next sync advances it.
# ---------------------------------------------------------------------------


def test_sync_cursor_tag_survives_aggressive_expiry(spark, tmp_path):
    """expire_snapshots(keep_last=1) between syncs no longer forces a
    re-convert: the tag pins the cursor snapshot, the sync replays
    linearly, and the tag advances (releasing the old snapshot for the
    NEXT expiry)."""
    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(4)), it, format_version=3)
    iceberg.convert_to_delta(it, dt)
    tags = [
        n
        for n in iceberg.current_metadata(it).get("refs", {})
        if n.startswith("sync-cursor-")
    ]
    assert len(tags) == 1
    for _ in range(3):
        iceberg.append(_df(spark, [(100 + _, 0, 1.0)]), it)
        iceberg.expire_snapshots(it, keep_last=1)
        # the cursor snapshot is still retained despite keep_last=1
        cursor = iceberg.resolve_ref(it, tags[0])
        assert cursor in {
            s["snapshot-id"]
            for s in iceberg.current_metadata(it)["snapshots"]
        }
        iceberg.sync_to_delta(it, dt)
        assert sorted(
            tuple(r) for r in delta_log.read_delta(spark, dt).collect()
        ) == sorted(
            tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
        )
    # the tag advanced with the final sync
    assert (
        iceberg.resolve_ref(it, tags[0])
        == iceberg.current_metadata(it)["current-snapshot-id"]
    )


def test_sync_cursor_tag_protects_rollback_compensation(spark, tmp_path):
    """Rollback + aggressive expiry between syncs: the tag keeps the
    OFF-ANCESTRY cursor snapshot retained, which is exactly what makes
    the compensating state diff computable."""
    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(4)), it, format_version=3)
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    iceberg.append(_df(spark, [(100, 0, -1.0)]), it)  # BAD
    iceberg.sync_to_delta(it, dt)
    iceberg.rollback_to_snapshot(it, good)
    iceberg.append(_df(spark, [(200, 1, 2.0)]), it)
    iceberg.expire_snapshots(it, keep_last=1)
    iceberg.sync_to_delta(it, dt)  # compensates — no re-convert
    v = delta_log.latest_version(dt)
    _op, params = delta_log._commit_operation(dt, v)
    assert params.get("sourceOperation") == "sync-compensate"
    assert sorted(
        r.id for r in delta_log.read_delta(spark, dt).collect()
    ) == sorted(list(range(4)) + [200])


# ---------------------------------------------------------------------------
# Round-12 verdict #5: a downstream IVM consuming the MIRROR's change
# feed reconverges across a compensating commit without special-casing
# — the compensation is real dataChange removes/adds.
# ---------------------------------------------------------------------------


def test_mirror_feed_ivm_reconverges_across_compensation(spark, tmp_path):
    """q225-style lineage-keyed IVM maintained off the Delta MIRROR:
    base state at the converted version + signed state of the mirror's
    lineage-diff feed across (BAD append → sync → rollback → GOOD
    append → compensating sync) must equal a full recompute of the
    mirror head."""
    from march_mania_spark_lakehouse_spark.operators import ivm

    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(8)).coalesce(1), it, format_version=3)
    good = iceberg.current_metadata(it)["current-snapshot-id"]
    iceberg.convert_to_delta(it, dt)
    v0 = delta_log.latest_version(dt)
    base = ivm.agg_state(
        delta_log.read_delta(spark, dt, v0).select("k", "val"),
        ["k"],
        "val",
    )
    iceberg.append(_df(spark, [(100, 0, -50.0), (101, 1, -60.0)]), it)
    iceberg.sync_to_delta(it, dt)
    iceberg.rollback_to_snapshot(it, good)
    iceberg.append(_df(spark, [(200, 1, 7.0)]), it)
    iceberg.sync_to_delta(it, dt)  # compensating commit
    v = delta_log.latest_version(dt)
    _op, params = delta_log._commit_operation(dt, v)
    assert params.get("sourceOperation") == "sync-compensate"
    feed = delta_log.snapshot_diff_changelog(spark, dt, v0).select(
        "k", "val", "_change_type"
    )
    delta_state = ivm.signed_state(feed, ["k"], "val")
    got = sorted(
        tuple(r)
        for r in ivm.finalize_counts(ivm.merge_states(base, delta_state))
        .select("k", F.col("n_rows").cast("long"), "sum_m")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in delta_log.read_delta(spark, dt)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("val").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_m"),
        )
        .collect()
    )
    assert got == want
    # and the BAD rows really left the mirror
    assert sorted(
        r.id for r in delta_log.read_delta(spark, dt).collect()
    ) == sorted(list(range(8)) + [200])


# ---------------------------------------------------------------------------
# Round-12 verdict #3: equality deletes crossing the format line —
# rewrite='auto' resolves them to per-file positions and encodes DVs.
# ---------------------------------------------------------------------------


def test_sync_rewrite_auto_resolves_equality_deletes(spark, tmp_path):
    """A v2 writer's CDC-style equality tombstones sync onto the Delta
    mirror as deletion vectors (strict still raises); the spec's
    strictly-lower-sequence rule is honored — rows re-appended AFTER
    the tombstone survive on the mirror."""
    from tests import delta_reader_independent as d_indep

    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(8)).coalesce(1), it, format_version=2)
    iceberg.convert_to_delta(it, dt)
    iceberg.delete_by_equality(
        spark, it, spark.createDataFrame([(2,), (5,)], "id long")
    )
    # re-append id=2 AFTER the tombstone: higher sequence → survives
    iceberg.append(_df(spark, [(2, 2, 200.0)]).coalesce(1), it)
    with pytest.raises(NotImplementedError, match="equality"):
        iceberg.sync_to_delta(it, dt)  # strict keeps the honest raise
    iceberg.sync_to_delta(it, dt, rewrite="auto")
    want = sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    )
    assert [r[0] for r in want] == [0, 1, 2, 3, 4, 6, 7]  # 5 gone, 2 re-added
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    ) == want
    assert sorted(d_indep.read_rows(dt)) == want


def test_sync_rewrite_auto_eq_deletes_upsert_shape(spark, tmp_path):
    """The full CDC upsert idiom (eq-delete + append, one upsert call)
    syncs under rewrite='auto': the mirror converges to the upserted
    population and stays converged across a follow-up upsert."""
    from tests import delta_reader_independent as d_indep

    it = str(tmp_path / "it")
    dt = str(tmp_path / "dt")
    iceberg.create(_df(spark, _rows(6)).coalesce(1), it, format_version=2)
    iceberg.convert_to_delta(it, dt)
    iceberg.upsert(
        spark, it,
        _df(spark, [(1, 9, 111.0), (10, 9, 110.0)]).coalesce(1),
        ["id"],
    )
    iceberg.sync_to_delta(it, dt, rewrite="auto")
    want = sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    )
    assert (1, 9, 111.0) in want and (10, 9, 110.0) in want
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    ) == want
    assert sorted(d_indep.read_rows(dt)) == want
    iceberg.upsert(
        spark, it, _df(spark, [(1, 8, 222.0)]).coalesce(1), ["id"]
    )
    iceberg.sync_to_delta(it, dt, rewrite="auto")
    want = sorted(
        tuple(r) for r in iceberg.read_iceberg(spark, it).collect()
    )
    assert sorted(
        tuple(r) for r in delta_log.read_delta(spark, dt).collect()
    ) == want
    assert sorted(d_indep.read_rows(dt)) == want


def test_equality_delete_positions_identity_partition(spark, tmp_path):
    """Eq keys that are identity partition columns (physically absent
    from data files) resolve from the manifest partition tuples —
    whole files match per tuple value."""
    t = str(tmp_path / "eqid")
    df = _df(spark, _rows(9))
    iceberg.create(df, t, partition_by=["k"], format_version=2)
    iceberg.delete_by_equality(
        spark, t, spark.createDataFrame([(1,)], "k long")
    )
    pos = iceberg._equality_delete_positions(
        t, iceberg.current_metadata(t)["current-snapshot-id"]
    )
    killed = sum(len(v) for v in pos.values())
    assert killed == 3  # ids 1, 4, 7 live in partition k=1
    # engine read agrees
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, t).collect()
    ) == [0, 2, 3, 5, 6, 8]


def test_iceberg_cdc_stream_across_identity_relayout(spark, tmp_path):
    """The streaming CDC source crosses a `repartition_table`: the
    relayout itself is feed-invisible ('replace'), and identity values
    restore PER ENTRY — pre-relayout files carry k physically (tuple
    lacks it), post-relayout files carry it only in the manifest tuple.
    The current-default-spec rule would null one generation."""
    from collections import Counter

    from march_mania_spark_lakehouse_spark.sources.pydatasource import (
        IcebergTableCdcStreamDataSource,
    )

    t = str(tmp_path / "rly")
    iceberg.create(_df(spark, _rows(4)), t, format_version=3)
    spark.dataSource.register(IcebergTableCdcStreamDataSource)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("iceberg_table_cdc")
            .option("path", t)
            .option("starting_sequence", "earliest")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    iceberg.repartition_table(spark, t, ["k"])  # feed-invisible
    iceberg.append(_df(spark, [(100, 1, 5.0)]), t)  # k in tuple only
    drain()
    iceberg.repartition_table(spark, t, [])  # back: k physical again
    iceberg.append(_df(spark, [(200, 2, 6.0)]), t)
    drain()
    rows = [
        r
        for f in sorted(os.listdir(sink))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
        for r in spark.read.parquet(os.path.join(sink, f)).collect()
    ]
    state: Counter = Counter()
    for r in rows:
        assert r._change_type in ("insert", "bootstrap_insert")
        state[(r.id, r.k, r.val)] += 1
    head = Counter(
        (r.id, r.k, r.val) for r in iceberg.read_iceberg(spark, t).collect()
    )
    assert +state == head  # every generation's k restored, none nulled
    assert state[(100, 1, 5.0)] == 1 and state[(200, 2, 6.0)] == 1


def test_equality_delete_resolution_prunes_by_bounds(
    spark, tmp_path, monkeypatch
):
    """The eq→position resolution skips candidate files whose manifest
    key bounds exclude every tombstone value — with sort-clustered
    files, only the touched file's keys are scanned (plus the
    tombstone file itself)."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "eqpr")
    iceberg.create(
        _df(spark, _rows(100)).repartitionByRange(4, "id"),
        t,
        format_version=2,
        stat_cols=["id"],
    )
    iceberg.delete_by_equality(
        spark, t, spark.createDataFrame([(7,)], "id long")
    )
    real = pq.read_table
    opened = []

    def counting(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", counting)
    pos = iceberg._equality_delete_positions(
        t, iceberg.current_metadata(t)["current-snapshot-id"]
    )
    assert sum(len(v) for v in pos.values()) == 1
    data_reads = [
        p
        for p in opened
        if "/data/" in p and "eqdelete-" not in os.path.basename(p)
    ]
    # 4 range-clustered data files: bounds keep only the one whose
    # [lo, hi] covers id=7 (the tombstone parquet itself always reads)
    assert len(data_reads) == 1, data_reads
